"""YUV4MPEG2 muxer/demuxer interop vs the reference binary.

Reference behavior: libavformat/yuv4mpegenc.c (header/tag generation),
yuv4mpegdec.c (parsing).  The reference ffmpeg must read our .y4m
streams sample-exactly and we must read its output of the same frames.
"""
import os
import subprocess

import numpy as np
import pytest

from tpu_ffv1.io.y4m import read_y4m, write_y4m

FFMPEG = os.path.join(os.path.dirname(__file__), "..", "refbuild",
                      "ffmpeg")
have_ffmpeg = os.path.exists(FFMPEG)


def _frames(pix_fmt, w, h, n=3, seed=0):
    rng = np.random.RandomState(seed)
    from tpu_ffv1.io.rawvideo import frame_shape
    out = []
    for _ in range(n):
        planes = []
        for shape, dt in frame_shape(pix_fmt, w, h):
            hi = 256 if dt == np.uint8 else 1024
            planes.append(rng.randint(0, hi, shape).astype(dt))
        out.append(planes)
    return out


@pytest.mark.parametrize("pix_fmt,w,h", [
    ("yuv420p", 34, 34), ("yuv422p", 24, 16), ("yuv444p", 17, 13),
    ("gray8", 33, 9), ("yuv420p10", 20, 12), ("yuv444p16", 8, 8),
])
def test_y4m_roundtrip(tmp_path, pix_fmt, w, h):
    frames = _frames(pix_fmt, w, h)
    p = str(tmp_path / "a.y4m")
    write_y4m(p, frames, pix_fmt, w, h)
    got, fmt2, w2, h2, fps = read_y4m(p)
    assert (fmt2.rstrip("le") if pix_fmt != "gray8" else fmt2) \
        .startswith(pix_fmt.rstrip("le")) or fmt2 == pix_fmt
    assert (w2, h2, fps) == (w, h, (25, 1))
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


@pytest.mark.skipif(not have_ffmpeg, reason="reference binary missing")
@pytest.mark.parametrize("pix_fmt,w,h", [
    ("yuv420p", 34, 34), ("yuv422p", 24, 16), ("yuv420p10", 20, 12),
])
def test_y4m_reference_reads_ours(tmp_path, pix_fmt, w, h):
    """refbuild/ffmpeg demuxes our .y4m back to the exact raw planes."""
    frames = _frames(pix_fmt, w, h)
    p = str(tmp_path / "a.y4m")
    raw = str(tmp_path / "a.yuv")
    write_y4m(p, frames, pix_fmt, w, h)
    subprocess.run([FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-i", p, "-f", "rawvideo", "-pix_fmt", pix_fmt,
                    "-y", raw], check=True)
    from tpu_ffv1.io.rawvideo import read_frames
    got = read_frames(raw, pix_fmt, w, h)
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


@pytest.mark.skipif(not have_ffmpeg, reason="reference binary missing")
@pytest.mark.parametrize("pix_fmt,w,h", [
    ("yuv420p", 34, 34), ("yuv444p", 17, 13), ("yuv422p10", 20, 12),
])
def test_y4m_we_read_reference(tmp_path, pix_fmt, w, h):
    """We demux refbuild/ffmpeg's y4m output sample-exactly."""
    frames = _frames(pix_fmt, w, h, seed=3)
    raw = str(tmp_path / "a.yuv")
    p = str(tmp_path / "a.y4m")
    from tpu_ffv1.io.rawvideo import write_frames
    write_frames(raw, frames)
    subprocess.run([FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-f", "rawvideo", "-pix_fmt", pix_fmt,
                    "-s", f"{w}x{h}", "-i", raw,
                    "-strict", "-1", "-y", p], check=True)
    got, fmt2, w2, h2, _ = read_y4m(p)
    assert (w2, h2) == (w, h)
    assert len(got) == len(frames)
    for a, b in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


@pytest.mark.skipif(not have_ffmpeg, reason="reference binary missing")
def test_y4m_cli_encode_decode(tmp_path):
    """CLI: .y4m in -> .avi (reference decodes losslessly) -> .y4m out."""
    from tpu_ffv1.cli.main import run
    w, h = 34, 34
    frames = _frames("yuv420p", w, h)
    src = str(tmp_path / "in.y4m")
    avi = str(tmp_path / "out.avi")
    back = str(tmp_path / "back.y4m")
    write_y4m(src, frames, "yuv420p", w, h)
    assert run(["-i", src, "-c:v", "ffv1", "-level", "3", "-coder", "2",
                "-slices", "4", avi]) == 0
    # reference binary decodes the CLI's AVI losslessly
    raw = str(tmp_path / "ref.yuv")
    subprocess.run([FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-i", avi, "-f", "rawvideo", "-pix_fmt", "yuv420p",
                    "-y", raw], check=True)
    from tpu_ffv1.io.rawvideo import read_frames
    got = read_frames(raw, "yuv420p", w, h)
    for a, b in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)
    # our CLI decode back to y4m
    assert run(["-i", avi, back]) == 0
    got2, _, _, _, _ = read_y4m(back)
    for a, b in zip(got2, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


@pytest.mark.skipif(not have_ffmpeg, reason="reference binary missing")
def test_cli_transcode_container_to_container(tmp_path):
    """ffmpeg.c transcode chain: .avi -> decode -> re-encode -> .nut,
    reference binary decodes the result losslessly."""
    from tpu_ffv1.cli.main import run
    w, h = 34, 34
    frames = _frames("yuv420p", w, h)
    src = str(tmp_path / "in.y4m")
    avi = str(tmp_path / "a.avi")
    nut = str(tmp_path / "b.nut")
    write_y4m(src, frames, "yuv420p", w, h)
    assert run(["-i", src, "-c:v", "ffv1", "-level", "3", "-coder", "2",
                "-slices", "4", avi]) == 0
    # transcode range-coder AVI -> golomb NUT
    assert run(["-i", avi, "-c:v", "ffv1", "-level", "3", "-coder", "0",
                "-slices", "4", nut]) == 0
    raw = str(tmp_path / "o.yuv")
    subprocess.run([FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-i", nut, "-f", "rawvideo", "-pix_fmt", "yuv420p",
                    "-y", raw], check=True)
    from tpu_ffv1.io.rawvideo import read_frames
    got = read_frames(raw, "yuv420p", w, h)
    for a, b in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


@pytest.mark.skipif(not have_ffmpeg, reason="reference binary missing")
def test_cli_stream_copy(tmp_path):
    """ffmpeg -c:v copy analog: packets remux untouched across
    containers and the reference binary still decodes losslessly."""
    from tpu_ffv1.cli.main import run
    w, h = 34, 34
    frames = _frames("yuv420p", w, h)
    src = str(tmp_path / "in.y4m")
    avi = str(tmp_path / "a.avi")
    mkv = str(tmp_path / "b.mkv")
    write_y4m(src, frames, "yuv420p", w, h)
    assert run(["-i", src, "-c:v", "ffv1", "-level", "3", "-coder", "2",
                "-slices", "4", avi]) == 0
    assert run(["-i", avi, "-c:v", "copy", mkv]) == 0
    raw = str(tmp_path / "o.yuv")
    subprocess.run([FFMPEG, "-hide_banner", "-loglevel", "error",
                    "-i", mkv, "-f", "rawvideo", "-pix_fmt", "yuv420p",
                    "-y", raw], check=True)
    from tpu_ffv1.io.rawvideo import read_frames
    got = read_frames(raw, "yuv420p", w, h)
    for a, b in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)
    # packets must be byte-identical across the remux
    from tpu_ffv1.io.avi import read_avi
    from tpu_ffv1.io.mkv import read_mkv
    assert read_mkv(mkv).packets == read_avi(avi).packets
