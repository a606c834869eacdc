"""Device decode compute probe: TPUFFV1Decoder step time vs batch.

Usage: python scripts/dec_compute_probe.py [batches...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
from bench import synth_1080p

batches = [int(a) for a in sys.argv[1:]] or [4, 5]


def mk_enc():
    return FFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24))


frames = synth_1080p()
pkts_per_stream = None
for batch in batches:
    streams = []
    for bi in range(batch):
        senc = mk_enc()
        sframes = synth_1080p(seed=bi)
        streams.append([senc.encode_frame(f)[0] for f in sframes])
    dec = TPUFFV1Decoder(1920, 1080, mk_enc().extradata, batch=batch)
    nf = len(streams[0])
    t0 = time.time()
    res = dec.decode_frames([streams[i][0] for i in range(batch)])
    compile_s = time.time() - t0
    # verify one plane losslessly to guard the probe itself
    assert np.array_equal(np.asarray(res[1][0][0]),
                          synth_1080p(seed=1)[0][0])
    reps = []
    for k in range(1, 5):
        t0 = time.time()
        dec.decode_frames([streams[i][k % nf] for i in range(batch)])
        reps.append((time.time() - t0) * 1000)
    med = sorted(reps)[len(reps) // 2]
    mpix = batch * 1920 * 1080 / med / 1000
    print(f"decode batch {batch} ({dec.L} lanes): compile {compile_s:.0f}s, "
          f"median {med:.0f} ms/step (min {min(reps):.0f}) = "
          f"{mpix:.1f} Mpix/s", flush=True)
