#!/usr/bin/env python3
"""Randomized differential soak vs the reference ffmpeg binary.

Samples random (pix_fmt, dims, level, coder, slices, context, gop,
slicecrc) configurations — far beyond the committed parity matrix — and
asserts, per draw:
  1. our encoder's packets are byte-identical to the reference's
  2. the reference binary losslessly decodes our AVI
  3. our decoder losslessly decodes the reference's AVI
(the fate-run.sh enc_dec triangle, randomized).  Any mismatch saves a
repro line and exits non-zero.

Usage:  python scripts/soak_vs_reference.py [seconds] [start_seed]
Intended as an idle-time burn-in; the committed tests stay the gate.
"""
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tests.util import (frames_equal, have_reference, ref_decode,  # noqa: E402
                        ref_encode, synth_frames)
from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder  # noqa: E402
from tpu_ffv1.io.avi import AviStream, write_avi  # noqa: E402

# (pix_fmt, horizontal subsample, vertical subsample)
FMTS = [
    ("yuv420p", 2, 2), ("yuv422p", 2, 1), ("yuv444p", 1, 1),
    ("yuv411p", 4, 1), ("yuv410p", 4, 4), ("yuv440p", 1, 2),
    ("gray", 1, 1), ("gray16le", 1, 1), ("ya8", 1, 1),
    ("yuv422p10le", 2, 1), ("yuv444p16le", 1, 1), ("yuv420p9le", 2, 2),
    ("bgr0", 1, 1), ("bgra", 1, 1), ("gbrp12le", 1, 1), ("gbrp9le", 1, 1),
    ("yuva420p", 2, 2), ("yuva444p16le", 1, 1), ("yuva422p10le", 2, 1),
]
SLICES = [4, 6, 9, 12, 16, 24]


def draw_config(rng):
    pix_fmt, sh, sv = FMTS[rng.randrange(len(FMTS))]
    w = rng.randrange(2, 130)
    h = rng.randrange(2, 130)
    w -= w % sh
    h -= h % sv
    w = max(w, sh)
    h = max(h, sv)
    level = rng.choice([0, 1, 3, 3, 3])  # weight toward v3
    encopts, kwargs = [], {}
    rgb = pix_fmt.startswith(("bgr", "gbr"))
    if level == 0:
        if rgb or pix_fmt.endswith(("10le", "12le", "16le", "9le")):
            level = 3  # v0 can't carry these
    if level in (0, 1):
        if level == 1:
            encopts += ["-level", "1"]
            kwargs["level"] = 1
        coder = rng.choice([0, 2])
        if coder:
            encopts += ["-coder", "2"]
            kwargs["coder"] = 2
        gop = rng.choice([1, 2, 5, 12])
        encopts += ["-g", str(gop)]
        kwargs["gop_size"] = gop
        return pix_fmt, w, h, encopts, kwargs
    # v3
    encopts += ["-level", "3"]
    kwargs["level"] = 3
    slices = rng.choice(SLICES)
    encopts += ["-slices", str(slices)]
    kwargs["slices"] = slices
    coder = rng.choice([-2, 0, 2, 2])
    if coder:
        encopts += ["-coder", str(coder)]
        kwargs["coder"] = coder
    if rng.random() < 0.3:
        encopts += ["-context", "1"]
        kwargs["context_model"] = 1
    if rng.random() < 0.3:
        encopts += ["-slicecrc", "1"]
        kwargs["slicecrc"] = 1
    gop = rng.choice([1, 2, 5, 12])
    encopts += ["-g", str(gop)]
    kwargs["gop_size"] = gop
    if coder == 0:
        encopts += ["-strict", "-2"]
        kwargs["strict"] = -2
    return pix_fmt, w, h, encopts, kwargs


def one_iter(seed):
    rng = random.Random(seed)
    pix_fmt, w, h, encopts, kwargs = draw_config(rng)
    n = rng.randrange(2, 9)
    engine = rng.choice(["spec", "native"])
    desc = (f"seed={seed} {pix_fmt} {w}x{h} n={n} engine={engine} "
            f"opts={' '.join(encopts)}")
    frames = synth_frames(pix_fmt, w, h, n, seed=seed & 0xFFFF)
    with tempfile.TemporaryDirectory() as td:
        avi = os.path.join(td, "ref.avi")
        st = ref_encode(frames, pix_fmt, w, h, encopts, avi, td)
        enc = FFV1Encoder(EncoderParams(width=w, height=h,
                                        pix_fmt=pix_fmt, **kwargs))
        pkts = [enc.encode_frame(f) for f in frames]
        for i, (p, _) in enumerate(pkts):
            assert p == st.packets[i], f"{desc}: packet {i} differs"
        # some degenerate configs make the reference self-inconsistent:
        # a 5px-wide image with -slices 24 encodes a stream its own
        # decoder rejects ("slice count invalid"), and a 4px-wide image
        # with 9 slice columns is LOSSY even through the reference's
        # own roundtrip (the slice grid can't tile the width; we match
        # its packets byte-for-byte either way).  Encode parity above
        # still holds, but the decode legs have no oracle — skip them.
        try:
            if not frames_equal(ref_decode(avi, pix_fmt, w, h, td),
                                frames):
                return desc + " [oracle-lossy: enc parity only]"
        except Exception:
            return desc + " [oracle-degenerate: enc parity only]"
        # reference decodes our stream
        ours = os.path.join(td, "ours.avi")
        write_avi(ours, AviStream(width=w, height=h,
                                  extradata=enc.extradata or b"",
                                  packets=[p for p, _ in pkts],
                                  keyflags=[k for _, k in pkts]))
        back = ref_decode(ours, pix_fmt, w, h, td)
        if pix_fmt == "bgr0":       # X channel decodes as 0 by contract
            back = [[np.concatenate([f[..., :3],
                                     np.zeros_like(f[..., :1])], -1)
                     for f in fr] if isinstance(fr, list) else fr
                    for fr in back]
        assert frames_equal(back, frames), f"{desc}: ref decode mismatch"
        # we decode the reference's stream
        dec = FFV1Decoder(w, h, st.extradata or None, engine=engine)
        mine = [dec.decode_frame(p)[0] for p in st.packets]
        assert frames_equal(mine, frames), f"{desc}: our decode mismatch"
    return desc


def main():
    if not have_reference():
        print("reference binary not built; nothing to soak")
        return 0
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t0 = time.time()
    n = 0
    seed = seed0
    while time.time() - t0 < budget:
        try:
            desc = one_iter(seed)
        except Exception as e:
            print(f"FAIL at {e}", flush=True)
            with open("/tmp/soak_fail.txt", "a") as f:
                f.write(f"{e}\n")
            return 1
        n += 1
        if n % 25 == 0:
            print(f"{n} configs ok, {time.time() - t0:.0f}s "
                  f"(last: {desc})", flush=True)
        seed += 1
    print(f"soak clean: {n} random configs in {time.time() - t0:.0f}s "
          f"(seeds {seed0}..{seed - 1})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
