"""NUT container interop (the libavformat/nut* analog; FFV1's second
FATE container)."""
import os
import subprocess

import numpy as np
import pytest

from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder
from tpu_ffv1.io.nut import NutStream, read_nut, write_nut
from tpu_ffv1.io.rawvideo import read_frames, write_frames

from .util import REF_FFMPEG, have_reference, synth_frames

W, H, N = 64, 48, 6


def _encode(frames, **kw):
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt="yuv420p",
                                    level=3, coder=2, slices=4, **kw))
    return enc, [enc.encode_frame(f) for f in frames]


def test_nut_self_roundtrip(tmp_path):
    frames = synth_frames("yuv420p", W, H, N)
    enc, pkts = _encode(frames, gop_size=3)
    path = os.path.join(str(tmp_path), "t.nut")
    write_nut(path, NutStream(width=W, height=H, extradata=enc.extradata,
                              packets=[p for p, _ in pkts],
                              keyflags=[k for _, k in pkts]))
    st = read_nut(path)
    assert (st.width, st.height) == (W, H)
    assert st.extradata == enc.extradata
    assert [bytes(p) for p in st.packets] == [p for p, _ in pkts]
    assert st.keyflags == [k for _, k in pkts]


@pytest.mark.skipif(not have_reference(), reason="no reference binary")
def test_nut_interop_with_reference(tmp_path):
    tmpdir = str(tmp_path)
    frames = synth_frames("yuv420p", W, H, N)
    enc, pkts = _encode(frames, gop_size=3)

    ours = os.path.join(tmpdir, "ours.nut")
    write_nut(ours, NutStream(width=W, height=H, extradata=enc.extradata,
                              packets=[p for p, _ in pkts],
                              keyflags=[k for _, k in pkts]))
    out = os.path.join(tmpdir, "out.yuv")
    subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "fatal",
                    "-i", ours, "-f", "rawvideo", "-pix_fmt", "yuv420p",
                    "-y", out], check=True)
    for fa, fb in zip(read_frames(out, "yuv420p", W, H), frames):
        for a, b in zip(fa, fb):
            assert np.array_equal(a, b)

    raw = os.path.join(tmpdir, "in.yuv")
    write_frames(raw, frames)
    refnut = os.path.join(tmpdir, "ref.nut")
    subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-f", "rawvideo", "-pix_fmt", "yuv420p", "-s",
                    f"{W}x{H}", "-i", raw, "-c:v", "ffv1", "-level", "3",
                    "-coder", "2", "-slices", "4", "-y", refnut],
                   check=True)
    st = read_nut(refnut)
    dec = FFV1Decoder(W, H, st.extradata)
    for pkt, f in zip(st.packets, frames):
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(a, b)
