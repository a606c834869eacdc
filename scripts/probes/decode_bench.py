"""Time the lane-major TPU decode at production shape (1080p, 24 slices,
batch 4) with forced transfers.  Uses a real encoded stream so the
byte/refill pattern is realistic, and verifies losslessness.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax

from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.tpu.decoder import TPUFFV1Decoder

W, H = 1920, 1080
batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in \
    sys.argv else 4

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
base = (np.add.outer(np.arange(H), np.arange(W)) % 256)
frames = []
for t in range(3):
    y = ((base + t * 3) + rng.randint(0, 16, (H, W))).astype(np.uint8)
    u = (rng.randint(0, 8, (H // 2, W // 2)) + 100).astype(np.uint8)
    v = (rng.randint(0, 8, (H // 2, W // 2)) + 160).astype(np.uint8)
    frames.append([y, u, v])

enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt="yuv420p",
                                level=3, coder=2, slices=24))
pkts = [enc.encode_frame(f)[0] for f in frames]
print("encoded", [len(p) for p in pkts], flush=True)

dec = TPUFFV1Decoder(W, H, enc.extradata, batch=batch)
t0 = time.time()
res = dec.decode_frames([pkts[0]] * batch)
print(f"decode first step (compile): {time.time()-t0:.1f} s", flush=True)
for a, b in zip(res[0][0], frames[0]):
    assert np.array_equal(a, b), "decode mismatch"
print("LOSSLESS: PASS", flush=True)

ts = []
for k in range(2):
    t0 = time.time()
    res = dec.decode_frames([pkts[1 + k]] * batch)
    ts.append(time.time() - t0)
mp = batch * W * H / min(ts) / 1e6
print(f"decode steady: {min(ts)*1e3:.0f} ms/step ({batch} frames) = "
      f"{mp:.2f} Mpix/s", flush=True)
