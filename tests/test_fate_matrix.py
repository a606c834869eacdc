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


def test_ya8_native_engine_roundtrip():
    """ya8 (interleaved luma+alpha) through BOTH host engines and both
    coders — the native runtime decodes into channel-strided views via
    its pixel-stride arg (ffv1dec.c:185 pixel_stride analog)."""
    import numpy as np
    from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder
    W, H = 50, 38
    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 255, (H, W, 2)).astype(np.uint8)
              for _ in range(4)]
    for coder in (0, 2):
        enc = FFV1Encoder(EncoderParams(
            width=W, height=H, pix_fmt="ya8", level=3, coder=coder,
            slices=4, gop_size=2))
        pkts = [enc.encode_frame(f) for f in frames]
        for engine in ("spec", "native"):
            dec = FFV1Decoder(W, H, enc.extradata, engine=engine)
            for fi, (p, _k) in enumerate(pkts):
                out, _ = dec.decode_frame(p)
                arr = np.asarray(out if isinstance(out, np.ndarray)
                                 else out[0])
                assert np.array_equal(arr, frames[fi]), \
                    (coder, engine, fi)
