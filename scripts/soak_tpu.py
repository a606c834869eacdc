#!/usr/bin/env python3
"""Randomized differential soak of the TPU tier (XLA path) vs the
reference binary and the spec engine.

Per draw: random TPU-supported config -> TPUFFV1Encoder packets must be
byte-identical to the reference encoder's, and TPUFFV1Decoder must
losslessly decode the reference stream.  Configs the TPU tier declines
(NotImplementedError capability guards) are skipped and counted.

Dims are drawn from a small pool so the persistent XLA compile cache
amortizes trace costs across iterations and runs.

Usage:  python scripts/soak_tpu.py [seconds] [start_seed]
"""
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU backend: this is a correctness soak of the lane-major machinery,
# not a perf run; the axon plugin hangs when its tunnel is down.  The
# axon sitecustomize imports jax at interpreter startup, so the env
# vars alone are too late — update the live config too (bench.py does
# the same).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
if "jax" in sys.modules:
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.util import (frames_equal, have_reference,  # noqa: E402
                        ref_encode, synth_frames)
from tpu_ffv1 import EncoderParams  # noqa: E402

DIM_POOL = [(48, 40), (64, 64), (80, 48), (96, 72), (52, 44), (36, 60)]
FMTS = [
    ("yuv420p", 2, 2), ("yuv422p", 2, 1), ("yuv444p", 1, 1),
    ("yuv440p", 1, 2), ("gray", 1, 1), ("gray16le", 1, 1),
    ("yuv422p10le", 2, 1), ("yuv444p16le", 1, 1), ("yuv420p9le", 2, 2),
    ("yuva420p", 2, 2), ("yuva422p10le", 2, 1), ("yuva444p16le", 1, 1),
    ("bgr0", 1, 1), ("bgra", 1, 1), ("gbrp12le", 1, 1), ("gbrp9le", 1, 1),
]


def draw_config(rng):
    pix_fmt, sh, sv = FMTS[rng.randrange(len(FMTS))]
    w, h = DIM_POOL[rng.randrange(len(DIM_POOL))]
    rgb = pix_fmt.startswith(("bgr", "gbr"))
    encopts = ["-level", "3"]
    kwargs = dict(level=3)
    slices = rng.choice([4, 6, 9, 12])
    encopts += ["-slices", str(slices)]
    kwargs["slices"] = slices
    coder = rng.choice([2, -2] if rgb else [-2, 0, 2, 2])
    encopts += ["-coder", str(coder)]
    kwargs["coder"] = coder
    if rng.random() < 0.3:
        encopts += ["-context", "1"]
        kwargs["context_model"] = 1
    if rng.random() < 0.25:
        encopts += ["-slicecrc", "1"]
        kwargs["slicecrc"] = 1
    gop = rng.choice([1, 2, 3])
    encopts += ["-g", str(gop)]
    kwargs["gop_size"] = gop
    if coder == 0:
        encopts += ["-strict", "-2"]
        kwargs["strict"] = -2
    return pix_fmt, w, h, encopts, kwargs


def one_iter(seed):
    from tpu_ffv1.tpu.decoder import TPUFFV1Decoder
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder

    rng = random.Random(seed)
    pix_fmt, w, h, encopts, kwargs = draw_config(rng)
    n = rng.randrange(2, 5)
    desc = (f"seed={seed} {pix_fmt} {w}x{h} n={n} "
            f"opts={' '.join(encopts)}")
    params = EncoderParams(width=w, height=h, pix_fmt=pix_fmt, **kwargs)
    try:
        enc = TPUFFV1Encoder(params)
    except NotImplementedError as e:
        return desc + f" [tpu-declined: {e}]", False
    frames = synth_frames(pix_fmt, w, h, n, seed=seed & 0xFFFF)
    with tempfile.TemporaryDirectory() as td:
        avi = os.path.join(td, "ref.avi")
        st = ref_encode(frames, pix_fmt, w, h, encopts, avi, td)
        for i, f in enumerate(frames):
            pkt, _ = enc.encode_frame(f)
            assert pkt == st.packets[i], f"{desc}: packet {i} differs"
        try:
            dec = TPUFFV1Decoder(w, h, st.extradata)
        except NotImplementedError as e:
            return desc + f" [tpu-decode-declined: {e}]", True
        mine = [dec.decode_frame(p)[0] for p in st.packets]
        assert frames_equal(mine, frames), f"{desc}: tpu decode mismatch"
    return desc, True


def main():
    if not have_reference():
        print("reference binary not built; nothing to soak")
        return 0
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t0 = time.time()
    n = declined = 0
    seed = seed0
    while time.time() - t0 < budget:
        try:
            desc, ran = one_iter(seed)
        except Exception as e:
            print(f"FAIL at {e}", flush=True)
            with open("/tmp/soak_tpu_fail.txt", "a") as f:
                f.write(f"{e}\n")
            return 1
        n += 1
        declined += not ran
        if n % 10 == 0:
            print(f"{n} configs ok ({declined} declined), "
                  f"{time.time() - t0:.0f}s (last: {desc})", flush=True)
        seed += 1
    print(f"tpu soak clean: {n} random configs ({declined} declined) in "
          f"{time.time() - t0:.0f}s (seeds {seed0}..{seed - 1})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
