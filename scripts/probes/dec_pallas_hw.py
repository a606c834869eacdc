"""Validate the Pallas decode kernel on real TPU hardware: decode
reference-encoder packets (GOP, multi-slice, batch) and compare with the
source frames + host decoder."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.tpu.decoder import TPUFFV1Decoder


def run_case(W, H, pix_fmt, slices, gop, batch, nframes=4, seed=7,
             spikes=False, **kw):
    rng = np.random.RandomState(seed)
    from tpu_ffv1.io.rawvideo import frame_shape
    frames = []
    for t in range(nframes):
        if spikes:
            # adversarial burst content for the paced byte feed: long
            # flat runs skew the zero/exponent states, then isolated
            # full-amplitude pixels cost many renorm bytes at once
            planes = []
            for s, dt in frame_shape(pix_fmt, W, H):
                mx = np.iinfo(dt).max if dt == np.uint8 else 1023
                p = np.zeros(s, dt)
                n = max(1, int(np.prod(s)) // 17)
                idx = rng.choice(int(np.prod(s)), n, replace=False)
                p.reshape(-1)[idx] = mx
                planes.append(p)
        else:
            planes = [rng.randint(0, 256, s).astype(dt)
                      for s, dt in frame_shape(pix_fmt, W, H)]
        frames.append(planes)
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt=pix_fmt,
                                    level=3, coder=2, slices=slices,
                                    gop_size=gop, **kw))
    pkts = [enc.encode_frame(f)[0] for f in frames]
    dec = TPUFFV1Decoder(W, H, enc.extradata, batch=batch)
    assert dec.use_pallas, "expected the Pallas path on this platform"
    t0 = time.time()
    for fi, p in enumerate(pkts):
        outs = dec.decode_frames([p] * batch)
        for bi, (planes, kf) in enumerate(outs):
            for j, (a, b) in enumerate(zip(frames[fi], planes)):
                if not np.array_equal(a, b):
                    bad = np.argwhere(np.asarray(a) != np.asarray(b))
                    print(f"  MISMATCH case {W}x{H} {pix_fmt} s{slices} "
                          f"frame {fi} stream {bi} plane {j}: "
                          f"{len(bad)} px, first {bad[:3].tolist()}")
                    return False
    print(f"  OK {W}x{H} {pix_fmt} slices={slices} gop={gop} "
          f"batch={batch} ({nframes} frames, {time.time()-t0:.1f}s)")
    return True


def main():
    ok = True
    ok &= run_case(24, 16, "gray", 1, 0, 1, nframes=2)
    ok &= run_case(24, 16, "yuv420p", 4, 2, 2, nframes=4)
    ok &= run_case(48, 32, "yuv422p", 4, 3, 1, nframes=3)
    ok &= run_case(64, 48, "yuv420p10le", 4, 2, 1, nframes=2)
    ok &= run_case(64, 48, "yuv420p10le", 4, 0, 1, nframes=2,
                   spikes=True)
    ok &= run_case(48, 32, "yuv420p", 4, 2, 2, nframes=3,
                   context_model=1)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
