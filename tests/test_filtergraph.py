"""Filtergraph (`-vf` linear chain, tpu_ffv1/filtergraph.py).

scale/format/null/copy chains are asserted byte-identical to the
reference binary run with ``-vf ... -sws_flags neighbor+bitexact``
(those four filters are enabled in the oracle build); crop/flip/
transpose/trim have exact-semantics unit tests against numpy
re-derivations of vf_crop.c / vf_hflip.c / vf_vflip.c /
vf_transpose.c / vf_trim.c.
"""
import os
import subprocess

import numpy as np
import pytest

from tpu_ffv1.filtergraph import FilterGraph, parse_graph
from tpu_ffv1.io.rawvideo import read_frames, write_frames

from .util import REF_FFMPEG, have_reference

W, H = 48, 36


def _synth(pix_fmt, seed=0, w=W, h=H):
    from tpu_ffv1.codec.pixfmt import get_pix_fmt
    from tpu_ffv1.io.rawvideo import frame_shape
    rng = np.random.RandomState(seed)
    fmt = get_pix_fmt(pix_fmt)
    mx = (1 << fmt.bits) - 1
    return [rng.randint(0, mx + 1, shape).astype(dt)
            for shape, dt in frame_shape(pix_fmt, w, h)]


def _ref_vf(frame, src_fmt, vf, out_fmt, out_w, out_h, tmpdir):
    src = os.path.join(tmpdir, "in.raw")
    dst = os.path.join(tmpdir, "out.raw")
    write_frames(src, [frame])
    subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error",
         "-f", "rawvideo", "-pix_fmt", src_fmt, "-s", f"{W}x{H}",
         "-i", src, "-vf", vf, "-pix_fmt", out_fmt,
         "-sws_flags", "neighbor+bitexact", "-f", "rawvideo", "-y", dst],
        check=True)
    return read_frames(dst, out_fmt, out_w, out_h)[0]


REF_CHAINS = [
    # (chain, src_fmt) — output fmt/dims derived from the graph
    ("null", "yuv420p"),
    ("copy,null", "yuv422p"),
    ("scale=24:16", "yuv420p"),
    ("scale=96:72", "yuv420p"),            # upscale
    ("scale=w=32:h=20", "yuv444p"),
    ("scale=24:-1", "yuv420p"),            # keep aspect
    ("format=yuv422p", "yuv420p"),
    ("scale=24:20,format=yuv444p", "yuv420p"),
    ("format=yuv420p10le", "yuv420p"),
    ("format=yuv420p,scale=20:12", "yuv444p16le"),
]


@pytest.mark.skipif(not have_reference(),
                    reason="reference ffmpeg binary not built")
@pytest.mark.parametrize("chain,src", REF_CHAINS,
                         ids=[c[0] for c in REF_CHAINS])
def test_vf_chain_matches_reference(chain, src, tmp_path):
    frame = _synth(src, seed=3)
    g = FilterGraph(chain, src, W, H)
    ours = g.run([frame])[0]
    ref = _ref_vf(frame, src, chain, g.out_fmt, g.out_w, g.out_h,
                  str(tmp_path))
    for i, (a, b) in enumerate(zip(ours, ref)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"plane {i} differs ({chain})"


def test_crop_semantics():
    f = _synth("yuv420p", seed=1)
    # default centring + chroma alignment (vf_crop.c:222-223, 344-345)
    g = FilterGraph("crop=20:10", "yuv420p", W, H)
    out = g.run([f])[0]
    x = ((W - 20) // 2) & ~1
    y = ((H - 10) // 2) & ~1
    assert np.array_equal(out[0], f[0][y:y + 10, x:x + 20])
    assert np.array_equal(out[1], f[1][y // 2:(y + 10 + 1) // 2,
                                       x // 2:(x + 20 + 1) // 2])
    g2 = FilterGraph("crop=16:12:4:6", "yuv420p", W, H)
    out2 = g2.run([f])[0]
    assert np.array_equal(out2[0], f[0][6:18, 4:20])
    assert out2[1].shape == (6, 8)


def test_flips_and_transpose():
    f = _synth("yuv420p", seed=2)
    assert np.array_equal(
        FilterGraph("hflip", "yuv420p", W, H).run([f])[0][0],
        f[0][:, ::-1])
    assert np.array_equal(
        FilterGraph("vflip", "yuv420p", W, H).run([f])[0][1],
        f[1][::-1, :])
    # hflip twice = identity
    rt = FilterGraph("hflip,hflip", "yuv420p", W, H).run([f])[0]
    assert all(np.array_equal(a, b) for a, b in zip(rt, f))
    # transpose dirs: cw then ccw = identity; cw == transpose of vflip
    g_cw = FilterGraph("transpose=1", "yuv420p", W, H)
    assert (g_cw.out_w, g_cw.out_h) == (H, W)
    cw = g_cw.run([f])[0]
    assert np.array_equal(cw[0], np.rot90(f[0], k=-1))
    back = FilterGraph("transpose=2", "yuv420p", H, W).run([cw])[0]
    assert all(np.array_equal(a, b) for a, b in zip(back, f))
    with pytest.raises(ValueError):
        FilterGraph("transpose=1", "yuv422p", W, H)


def test_trim_and_chain_state():
    frames = [_synth("yuv420p", seed=s) for s in range(5)]
    g = FilterGraph("trim=start_frame=1:end_frame=3", "yuv420p", W, H)
    out = g.run(frames)
    assert len(out) == 2
    assert np.array_equal(out[0][0], frames[1][0])
    assert np.array_equal(out[1][0], frames[2][0])


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_graph("scale=2:2;null")          # multi-branch
    with pytest.raises(ValueError):
        parse_graph("[in]null[out]")           # labeled pads
    with pytest.raises(ValueError):
        parse_graph("nosuchfilter")
    with pytest.raises(ValueError):
        FilterGraph("crop=100:100", "yuv420p", W, H)   # larger than src
    with pytest.raises(ValueError):
        FilterGraph("hflip=1", "yuv420p", W, H)        # no-arg filter


def test_cli_vf_roundtrip(tmp_path):
    """-vf through the CLI: encode a scaled/cropped stream, decode it
    back, sizes and content must match the host-filtered frames."""
    from tpu_ffv1.cli.main import run as cli_run
    frames = [_synth("yuv420p", seed=s) for s in range(3)]
    src = str(tmp_path / "in.yuv")
    avi = str(tmp_path / "v.avi")
    out = str(tmp_path / "out.yuv")
    write_frames(src, frames)
    cli_run(["-f", "rawvideo", "-pix_fmt", "yuv420p", "-s", f"{W}x{H}",
             "-i", src, "-vf", "crop=32:24,scale=24:16", "-c:v", "ffv1",
             "-level", "3", "-slices", "4", avi])
    cli_run(["-i", avi, "-f", "rawvideo", "-pix_fmt", "yuv420p", out])
    got = read_frames(out, "yuv420p", 24, 16)
    want = FilterGraph("crop=32:24,scale=24:16", "yuv420p", W, H) \
        .run(frames)
    assert len(got) == len(want)
    for fg, fw in zip(got, want):
        for a, b in zip(fg, fw):
            assert np.array_equal(np.asarray(a), np.asarray(b))
