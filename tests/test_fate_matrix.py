"""Full FATE-scale matrix (tests/fate/vcodec.mak analog): the reference's
exact test dimensions (50 frames of 352x288) across its FFV1 config list,
asserting byte-exact encode and bidirectional lossless decode.

Slow (~minutes): run with FFV1_FATE_FULL=1 (the driver/nightly analog of
`make fate`); a 12-frame subset always runs.
"""
import os

import numpy as np
import pytest

from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder

from .util import frames_equal, have_reference, ref_encode, synth_frames

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference ffmpeg binary not built")

W, H = 352, 288
N = 50 if os.environ.get("FFV1_FATE_FULL") else 12

# the reference's FATE FFV1 list (tests/fate/vcodec.mak:113-127)
MATRIX = [
    ("ffv1", "yuv420p", ["-slices", "4", "-strict", "-2"],
     dict(slices=4, strict=-2)),
    ("ffv1-v0", "yuv420p", [], {}),
    ("ffv1-v3-yuv420p", "yuv420p", ["-level", "3", "-pix_fmt", "yuv420p"],
     dict(level=3)),
    ("ffv1-v3-yuv422p10", "yuv422p10le", ["-level", "3"], dict(level=3)),
    ("ffv1-v3-yuv444p16", "yuv444p16le", ["-level", "3"], dict(level=3)),
    ("ffv1-v3-bgr0", "bgr0", ["-level", "3"], dict(level=3)),
]


@pytest.mark.parametrize("label,pix_fmt,encopts,kwargs", MATRIX,
                         ids=[m[0] for m in MATRIX])
def test_fate_matrix(tmp_path, label, pix_fmt, encopts, kwargs):
    tmpdir = str(tmp_path)
    frames = synth_frames(pix_fmt, W, H, N)
    avi = os.path.join(tmpdir, "ref.avi")
    st = ref_encode(frames, pix_fmt, W, H, encopts, avi, tmpdir)

    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt=pix_fmt,
                                    **kwargs))
    for i, f in enumerate(frames):
        pkt, _ = enc.encode_frame(f)
        assert pkt == st.packets[i], f"{label} frame {i}"

    dec = FFV1Decoder(W, H, st.extradata or None)
    decoded = [dec.decode_frame(p)[0] for p in st.packets]
    assert frames_equal(decoded, frames)
