"""swscale analog (tpu_ffv1/swscale.py) vs the reference library.

The planar paths must be byte-identical to the reference binary run
with ``-sws_flags neighbor+bitexact`` — the FATE vcodec harness mode
(tests/fate/vcodec.mak:119-121, fate-run.sh:168).  RGB matrix
conversions are interop-tier: asserted by PSNR like FATE does for bgr0
(tests/ref/vsynth/vsynth1-ffv1-v3-bgr0:4).
"""
import os
import subprocess

import numpy as np
import pytest

from tpu_ffv1.swscale import convert
from tpu_ffv1.io.rawvideo import read_frames, write_frames

from .util import REF_FFMPEG, have_reference

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference ffmpeg binary not built")

W, H = 40, 24


def _synth(pix_fmt, seed=0):
    from tpu_ffv1.codec.pixfmt import get_pix_fmt
    from tpu_ffv1.io.rawvideo import frame_shape
    rng = np.random.RandomState(seed)
    fmt = get_pix_fmt(pix_fmt)
    mx = (1 << fmt.bits) - 1
    planes = []
    for shape, dt in frame_shape(pix_fmt, W, H):
        planes.append(rng.randint(0, mx + 1, shape).astype(dt))
    return planes


def _ref_convert(frame, src_fmt, dst_fmt, tmpdir):
    src = os.path.join(tmpdir, "in.raw")
    dst = os.path.join(tmpdir, "out.raw")
    write_frames(src, [frame])
    subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error",
         "-f", "rawvideo", "-pix_fmt", src_fmt, "-s", f"{W}x{H}",
         "-i", src, "-pix_fmt", dst_fmt,
         "-sws_flags", "neighbor+bitexact", "-f", "rawvideo", "-y", dst],
        check=True)
    return read_frames(dst, dst_fmt, W, H)[0]


PLANAR_PAIRS = [
    ("yuv420p", "yuv444p"),       # chroma upsample
    ("yuv420p", "yuv422p"),
    ("yuv444p", "yuv420p"),       # chroma downsample
    ("yuv422p", "yuv410p"),
    ("yuv420p", "yuv420p10le"),   # depth up (shiftonly)
    ("yuv420p", "yuv444p16le"),   # depth + chroma up
    ("yuv420p10le", "yuv420p"),   # depth down (ordered dither)
    ("yuv444p16le", "yuv420p"),   # depth + chroma down
    ("yuv422p10le", "yuv444p16le"),
    ("yuv444p16le", "yuv422p10le"),  # 16 -> 10 dither
    ("gray", "gray16le"),
    ("gray16le", "gray"),
    ("yuv420p", "gray"),          # drop chroma
    ("gray", "yuv420p"),          # fill chroma at mid
]


@pytest.mark.parametrize("src_fmt,dst_fmt", PLANAR_PAIRS,
                         ids=[f"{a}->{b}" for a, b in PLANAR_PAIRS])
def test_planar_bitexact(tmp_path, src_fmt, dst_fmt):
    frame = _synth(src_fmt)
    ref = _ref_convert(frame, src_fmt, dst_fmt, str(tmp_path))
    mine = convert(frame, src_fmt, dst_fmt, W, H)
    assert len(mine) == len(ref)
    for i, (a, b) in enumerate(zip(mine, ref)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"plane {i}: {np.abs(a.astype(int) - b.astype(int)).max()} max err"


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 999.0
    return 10 * np.log10(255.0 ** 2 / mse)


def test_rgb_roundtrip_psnr():
    """RGB -> YUV -> RGB interop accuracy (matrix conversion is lossy by
    nature; FATE's bgr0 goldens assert ~38 dB after the same trip,
    tests/ref/vsynth/vsynth1-ffv1-v3-bgr0:4)."""
    rng = np.random.RandomState(2)
    rgb = np.zeros((H, W, 4), np.uint8)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 5) % 200
    for c in range(3):
        rgb[..., c] = base + rng.randint(0, 40, (H, W))
    yuv = convert(rgb, "bgr0", "yuv444p", W, H)
    back = convert(yuv, "yuv444p", "bgr0", W, H)
    assert _psnr(back[..., :3], rgb[..., :3]) > 35


def test_rgb_vs_reference_close():
    """Our BT.601 integer transform vs the reference's swscale yuv->rgb
    (slightly different fixed-point pipelines; must agree within the
    interop tolerance everywhere)."""
    frame = _synth("yuv420p", seed=3)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        ref = _ref_convert(frame, "yuv420p", "bgra", td)
    mine = convert(frame, "yuv420p", "bgra", W, H)
    diff = np.abs(np.asarray(mine)[..., :3].astype(int) -
                  np.asarray(ref)[..., :3].astype(int))
    assert diff.max() <= 4, diff.max()
    assert _psnr(np.asarray(mine)[..., :3], np.asarray(ref)[..., :3]) > 40


def test_cli_transcode_with_conversion(tmp_path):
    """FATE-harness analog through the CLI: raw yuv420p -> in-pipeline
    convert -> encode yuv422p10 -> decode -> convert back to yuv420p,
    byte-identical to the reference binary doing the same
    (tests/fate/vcodec.mak:119-121 semantics)."""
    import sys
    td = str(tmp_path)
    rng = np.random.RandomState(5)
    y = rng.randint(0, 256, (H, W)).astype(np.uint8)
    u = rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8)
    v = rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8)
    raw = os.path.join(td, "in.yuv")
    open(raw, "wb").write(y.tobytes() + u.tobytes() + v.tobytes())
    ours = os.path.join(td, "ours.avi")
    refa = os.path.join(td, "ref.avi")
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ffv1", "-f", "rawvideo",
         "-in_pix_fmt", "yuv420p", "-pix_fmt", "yuv422p10le",
         "-s", f"{W}x{H}", "-i", raw, "-level", "3", "-slices", "4",
         ours], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error",
         "-f", "rawvideo", "-pix_fmt", "yuv420p", "-s", f"{W}x{H}",
         "-i", raw, "-pix_fmt", "yuv422p10le",
         "-sws_flags", "neighbor+bitexact",
         "-c:v", "ffv1", "-level", "3", "-slices", "4", "-y", refa],
        check=True)
    from tpu_ffv1.io.avi import read_avi
    a, b = read_avi(ours), read_avi(refa)
    assert [bytes(p) for p in a.packets] == [bytes(p) for p in b.packets]
    # decode + convert back
    dec_ours = os.path.join(td, "dec_ours.yuv")
    dec_ref = os.path.join(td, "dec_ref.yuv")
    r = subprocess.run(
        [sys.executable, "-m", "tpu_ffv1", "-i", ours, "-f", "rawvideo",
         "-pix_fmt", "yuv420p", dec_ours], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", refa,
         "-pix_fmt", "yuv420p", "-sws_flags", "neighbor+bitexact",
         "-f", "rawvideo", "-y", dec_ref], check=True)
    assert open(dec_ours, "rb").read() == open(dec_ref, "rb").read()
