"""Golden parity vs the reference ffmpeg binary (framework analog of the
FATE enc_dec harness, tests/fate-run.sh:171-193 and tests/fate/vcodec.mak).

Three assertions per config:
  1. our encoder's packets are byte-identical to the reference encoder's
  2. our decoder losslessly decodes the reference encoder's stream
  3. the reference binary losslessly decodes our encoder's stream
"""
import os

import numpy as np
import pytest

from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder
from tpu_ffv1.io.avi import AviStream, write_avi

from .util import (extradata_equal, frames_equal, have_reference, ref_decode,
                   ref_encode, synth_frames)

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference ffmpeg binary not built")

W, H, N = 48, 40, 6

CONFIGS = [
    # (label, pix_fmt, ref encopts, our EncoderParams kwargs)
    ("v0_420_rice", "yuv420p", [], {}),
    ("v3_420_s4_rice", "yuv420p", ["-slices", "4", "-strict", "-2"],
     dict(slices=4, strict=-2)),
    ("v3_420_s4_range", "yuv420p", ["-level", "3", "-coder", "2",
                                    "-slices", "4"],
     dict(level=3, coder=2, slices=4)),
    ("v3_420_rangedef", "yuv420p", ["-level", "3", "-coder", "-2",
                                    "-slices", "4"],
     dict(level=3, coder=-2, slices=4)),
    ("v1_range", "yuv420p", ["-level", "1", "-coder", "2"],
     dict(level=1, coder=2)),
    ("v3_ctx1", "yuv420p", ["-context", "1", "-slices", "4",
                            "-strict", "-2"],
     dict(context_model=1, slices=4, strict=-2)),
    ("v3_422p10", "yuv422p10le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_444p16", "yuv444p16le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v0_gray", "gray", [], {}),
    ("v1_gray16", "gray16le", [], {}),
    ("v0_410", "yuv410p", [], {}),
    ("v0_411", "yuv411p", [], {}),
    ("v3_bgr0", "bgr0", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_bgra", "bgra", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_gbrp12", "gbrp12le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_yuva420", "yuva420p", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v0_ya8", "ya8", [], {}),
    ("v0_intra_gop1", "yuv420p", ["-g", "1"], dict(gop_size=1)),
    ("v3_gop3", "yuv420p", ["-g", "3", "-slices", "4", "-strict", "-2"],
     dict(gop_size=3, slices=4, strict=-2)),
    ("v3_440", "yuv440p", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v2_inband", "yuv420p", ["-level", "2", "-strict", "-2",
                              "-slices", "4"],
     dict(level=2, strict=-2, slices=4)),
    ("v2_inband_range", "yuv420p", ["-level", "2", "-coder", "2",
                                    "-strict", "-2", "-slices", "4"],
     dict(level=2, coder=2, strict=-2, slices=4)),
    # round-3 corner sweep: deep alpha, 9-bit, gray16 v3, 5-input
    # contexts on the Golomb coder, explicit slice CRCs
    ("v3_yuva444p16", "yuva444p16le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_420p9", "yuv420p9le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_gbrp9", "gbrp9le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_gray16", "gray16le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
    ("v3_ctx1_rice", "yuv420p", ["-context", "1", "-coder", "0",
                                 "-slices", "4", "-strict", "-2"],
     dict(context_model=1, coder=0, slices=4, strict=-2)),
    ("v3_slicecrc", "yuv420p", ["-level", "3", "-slices", "4",
                                "-slicecrc", "1"],
     dict(level=3, slices=4, slicecrc=1)),
    ("v3_yuva422p10", "yuva422p10le", ["-level", "3", "-slices", "4"],
     dict(level=3, slices=4)),
]


@pytest.mark.parametrize("label,pix_fmt,encopts,kwargs",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_parity(tmp_path, label, pix_fmt, encopts, kwargs):
    tmpdir = str(tmp_path)
    frames = synth_frames(pix_fmt, W, H, N)
    avi = os.path.join(tmpdir, "ref.avi")
    st = ref_encode(frames, pix_fmt, W, H, encopts, avi, tmpdir)

    # 1) byte-exact encode
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt=pix_fmt,
                                    **kwargs))
    assert extradata_equal(st.extradata, enc.extradata or b"")
    mypkts = []
    mykeys = []
    for i, f in enumerate(frames):
        pkt, key = enc.encode_frame(f)
        mypkts.append(pkt)
        mykeys.append(key)
        assert pkt == st.packets[i], \
            f"frame {i} differs (mine {len(pkt)}B ref {len(st.packets[i])}B)"

    # 2) our decoder on the reference stream
    dec = FFV1Decoder(W, H, st.extradata or None)
    decoded = [dec.decode_frame(p)[0] for p in st.packets]
    assert frames_equal(decoded, frames)

    # 3) reference decoder on our stream (via our AVI muxer)
    my_avi = os.path.join(tmpdir, "mine.avi")
    write_avi(my_avi, AviStream(width=W, height=H,
                                extradata=enc.extradata or b"",
                                packets=mypkts, keyflags=mykeys))
    ref_frames = ref_decode(my_avi, pix_fmt, W, H, tmpdir)
    assert frames_equal(ref_frames, frames)


V4_CONFIGS = [
    ("v4_420", "yuv420p", ["-level", "4", "-strict", "-2", "-slices", "4",
                           "-g", "3"]),
    ("v4_bgr0", "bgr0", ["-level", "4", "-strict", "-2", "-slices", "4"]),
    ("v4_422p10", "yuv422p10le", ["-level", "4", "-strict", "-2",
                                  "-slices", "4"]),
]


@pytest.mark.parametrize("label,pix_fmt,encopts", V4_CONFIGS,
                         ids=[c[0] for c in V4_CONFIGS])
def test_v4_decode(tmp_path, label, pix_fmt, encopts):
    """Version-4 streams (per-slice rct coefs, slice_reset_contexts, PCM
    fallback headers) from the reference's experimental encoder must
    decode losslessly (ffv1dec.c:345-356 paths)."""
    tmpdir = str(tmp_path)
    frames = synth_frames(pix_fmt, W, H, N)
    avi = os.path.join(tmpdir, "ref4.avi")
    st = ref_encode(frames, pix_fmt, W, H, encopts, avi, tmpdir)
    dec = FFV1Decoder(W, H, st.extradata)
    assert dec.version == 4
    decoded = [dec.decode_frame(p)[0] for p in st.packets]
    assert frames_equal(decoded, frames)


V4_ENC_CONFIGS = [("yuv420p",), ("bgr0",), ("gbrp12le",), ("gray8",)]


@pytest.mark.parametrize("pix_fmt", [c[0] for c in V4_ENC_CONFIGS])
def test_v4_encode_reference_decodes(tmp_path, pix_fmt):
    """Our experimental v4 encoder (per-slice RCT search, v4 headers,
    single-plane gray) must produce streams the reference binary decodes
    losslessly.  (v4 YUV is not bit-identical to the reference encoder by
    design — see codec/rct.py.)"""
    from .util import ref_decode
    tmpdir = str(tmp_path)
    frames = synth_frames(pix_fmt, W, H, N)
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt=pix_fmt,
                                    level=4, strict=-2, slices=4,
                                    gop_size=3))
    assert enc.rp.version == 4
    dec = FFV1Decoder(W, H, enc.extradata)
    pkts = []
    keys = []
    for f in frames:
        pkt, key = enc.encode_frame(f)
        pkts.append(pkt)
        keys.append(key)
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(np.asarray(a), np.asarray(b))
    my_avi = os.path.join(tmpdir, "v4.avi")
    write_avi(my_avi, AviStream(width=W, height=H,
                                extradata=enc.extradata,
                                packets=pkts, keyflags=keys))
    assert frames_equal(ref_decode(my_avi, pix_fmt, W, H, tmpdir), frames)


def test_v4_yuv444p16_exact_parity(tmp_path):
    """v4 full-res >8-bit YUV is byte-identical to the reference,
    including its RCT parameter search which runs on YUV too
    (ffv1enc.c:1163-1164 has no colorspace guard) and reads the previous
    row back from an int16_t scratch buffer (ffv1enc.c:1087) — noise
    input exercises the 16-bit wrap of those first differences."""
    tmpdir = str(tmp_path)
    rng = np.random.RandomState(1)
    frames = [[rng.randint(0, 65536, (H, W)).astype(np.uint16)
               for _ in range(3)] for _ in range(4)]
    avi = os.path.join(tmpdir, "ref16.avi")
    st = ref_encode(frames, "yuv444p16le", W, H,
                    ["-level", "4", "-strict", "-2", "-coder", "2",
                     "-slices", "4", "-g", "2"], avi, tmpdir)
    enc = FFV1Encoder(EncoderParams(width=W, height=H,
                                    pix_fmt="yuv444p16le", level=4,
                                    strict=-2, coder=2, slices=4,
                                    gop_size=2))
    assert extradata_equal(st.extradata, enc.extradata)
    for i, f in enumerate(frames):
        pkt, _ = enc.encode_frame(f)
        assert pkt == st.packets[i], \
            f"frame {i} differs (mine {len(pkt)}B ref {len(st.packets[i])}B)"
