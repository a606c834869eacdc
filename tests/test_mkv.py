"""Matroska container interop (the libavformat/matroska* analog)."""
import os
import subprocess

import numpy as np
import pytest

from tpu_ffv1 import EncoderParams, FFV1Decoder, FFV1Encoder
from tpu_ffv1.io.mkv import MkvStream, read_mkv, write_mkv
from tpu_ffv1.io.rawvideo import read_frames, write_frames

from .util import REF_FFMPEG, have_reference, synth_frames

W, H, N = 64, 48, 6


def _encode(frames, **kw):
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt="yuv420p",
                                    level=3, coder=2, slices=4, **kw))
    pkts = [enc.encode_frame(f) for f in frames]
    return enc, pkts


def test_mkv_self_roundtrip(tmp_path):
    frames = synth_frames("yuv420p", W, H, N)
    enc, pkts = _encode(frames, gop_size=3)
    path = os.path.join(str(tmp_path), "t.mkv")
    write_mkv(path, MkvStream(width=W, height=H, extradata=enc.extradata,
                              packets=[p for p, _ in pkts],
                              keyflags=[k for _, k in pkts]))
    st = read_mkv(path)
    assert (st.width, st.height) == (W, H)
    assert st.extradata == enc.extradata
    assert [bytes(p) for p in st.packets] == [p for p, _ in pkts]
    dec = FFV1Decoder(W, H, st.extradata)
    for pkt, f in zip(st.packets, frames):
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(a, b)


@pytest.mark.skipif(not have_reference(), reason="no reference binary")
def test_mkv_interop_with_reference(tmp_path):
    tmpdir = str(tmp_path)
    frames = synth_frames("yuv420p", W, H, N)
    enc, pkts = _encode(frames, gop_size=3)

    # ours -> reference decodes
    ours = os.path.join(tmpdir, "ours.mkv")
    write_mkv(ours, MkvStream(width=W, height=H, extradata=enc.extradata,
                              packets=[p for p, _ in pkts],
                              keyflags=[k for _, k in pkts]))
    out = os.path.join(tmpdir, "out.yuv")
    subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-i", ours, "-f", "rawvideo", "-pix_fmt", "yuv420p",
                    "-y", out], check=True)
    dec_frames = read_frames(out, "yuv420p", W, H)
    for fa, fb in zip(dec_frames, frames):
        for a, b in zip(fa, fb):
            assert np.array_equal(a, b)

    # reference muxes mkv -> we demux and decode
    raw = os.path.join(tmpdir, "in.yuv")
    write_frames(raw, frames)
    refmkv = os.path.join(tmpdir, "ref.mkv")
    subprocess.run([REF_FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-f", "rawvideo", "-pix_fmt", "yuv420p", "-s",
                    f"{W}x{H}", "-i", raw, "-c:v", "ffv1", "-level", "3",
                    "-coder", "2", "-slices", "4", "-y", refmkv],
                   check=True)
    st = read_mkv(refmkv)
    dec = FFV1Decoder(W, H, st.extradata)
    for pkt, f in zip(st.packets, frames):
        planes, _ = dec.decode_frame(pkt)
        for a, b in zip(planes, f):
            assert np.array_equal(a, b)
