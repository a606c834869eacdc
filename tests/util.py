"""Shared test helpers: synthetic frame generation and the reference
ffmpeg oracle (built once into refbuild/, skipped when absent)."""
from __future__ import annotations

import os
import subprocess

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_FFMPEG = os.path.join(REPO, "refbuild", "ffmpeg")


def have_reference() -> bool:
    return os.access(REF_FFMPEG, os.X_OK)


def synth_frames(pix_fmt: str, width: int, height: int, n: int,
                 seed: int = 3):
    """Deterministic gradient+noise frames, valid for the format's bit
    depth (the framework analog of tests/videogen.c's vsynth fixtures)."""
    from tpu_ffv1.io.rawvideo import frame_shape
    from tpu_ffv1.codec.pixfmt import get_pix_fmt

    fmt = get_pix_fmt(pix_fmt)
    rng = np.random.RandomState(seed)
    frames = []
    for t in range(n):
        planes = []
        for shape, dt in frame_shape(pix_fmt, width, height):
            hi = 1 << fmt.bits
            if dt == np.uint8:
                hi = min(hi, 256)
            grad = (np.add.outer(np.arange(shape[0]), np.arange(shape[1]))
                    * max(hi // 64, 1) + t * 7) % hi
            if len(shape) == 3:
                grad = grad[..., None] + np.arange(shape[2])
            noise = rng.randint(0, max(hi // 32, 2), shape)
            plane = ((grad + noise) % hi).astype(dt)
            if fmt.colorspace == 1 and fmt.bits <= 8 and \
                    not fmt.transparency:
                plane[..., 3] = 0  # bgr0: X channel is not coded
            planes.append(plane)
        frames.append(planes)
    return frames


def ref_encode(frames, pix_fmt: str, width: int, height: int,
               encopts, out_avi: str, tmpdir: str):
    """Encode frames with the reference binary; returns parsed AviStream."""
    from tpu_ffv1.io.rawvideo import write_frames
    from tpu_ffv1.io.avi import read_avi

    raw = os.path.join(tmpdir, "in.yuv")
    write_frames(raw, frames)
    subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-f", "rawvideo",
         "-pix_fmt", pix_fmt, "-s", f"{width}x{height}", "-i", raw,
         "-c:v", "ffv1"] + list(encopts) + ["-y", out_avi],
        check=True)
    return read_avi(out_avi)


def ref_decode(avi_path: str, pix_fmt: str, width: int, height: int,
               tmpdir: str):
    """Decode an AVI with the reference binary -> list of frames."""
    from tpu_ffv1.io.rawvideo import read_frames

    raw = os.path.join(tmpdir, "out.yuv")
    subprocess.run(
        [REF_FFMPEG, "-hide_banner", "-loglevel", "error", "-i", avi_path,
         "-f", "rawvideo", "-pix_fmt", pix_fmt, "-y", raw],
        check=True)
    return read_frames(raw, pix_fmt, width, height)


def extradata_equal(ref: bytes, mine: bytes) -> bool:
    """Compare container extradata, tolerating AVI strf even-padding
    (ffmpeg pads odd extradata with a trailing zero; CRC-neutral)."""
    ref = ref or b""
    mine = mine or b""
    longer, shorter = (ref, mine) if len(ref) >= len(mine) else (mine, ref)
    return longer[:len(shorter)] == shorter and \
        all(b == 0 for b in longer[len(shorter):])


def frames_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for fa, fb in zip(a, b):
        if isinstance(fa, np.ndarray):
            fa = [fa]
        if isinstance(fb, np.ndarray):
            fb = [fb]
        for pa, pb in zip(fa, fb):
            if not np.array_equal(np.asarray(pa), np.asarray(pb)):
                return False
    return True
