"""CLI extras: -ss seek, -probe -of json, -c:v copy plumbing."""
import json
import io
import contextlib

import numpy as np
import pytest

from tpu_ffv1.cli.main import run
from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.io.avi import AviStream, write_avi
from tpu_ffv1.io.rawvideo import read_frames

W, H = 40, 24


def _mk_avi(tmp_path, n=6, gop=3):
    rng = np.random.RandomState(8)
    frames = [[rng.randint(0, 255, (H, W)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)]
              for _ in range(n)]
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt="yuv420p",
                                    level=3, coder=2, slices=4,
                                    gop_size=gop))
    pkts = [enc.encode_frame(f) for f in frames]
    p = str(tmp_path / "clip.avi")
    write_avi(p, AviStream(width=W, height=H, extradata=enc.extradata,
                           packets=[pk for pk, _ in pkts],
                           keyflags=[k for _, k in pkts]))
    return p, frames


def test_cli_seek_decodes_from_keyframe(tmp_path):
    avi, frames = _mk_avi(tmp_path)
    out = str(tmp_path / "o.yuv")
    assert run(["-i", avi, "-ss", "4", "-f", "rawvideo",
                "-pix_fmt", "yuv420p", out]) == 0
    got = read_frames(out, "yuv420p", W, H)
    assert len(got) == 2
    for a, b in zip(got, frames[4:]):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_cli_seek_plus_frames(tmp_path):
    avi, frames = _mk_avi(tmp_path)
    out = str(tmp_path / "o.yuv")
    assert run(["-i", avi, "-ss", "1", "-frames:v", "2", "-f",
                "rawvideo", "-pix_fmt", "yuv420p", out]) == 0
    got = read_frames(out, "yuv420p", W, H)
    assert len(got) == 2
    for a, b in zip(got, frames[1:3]):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_cli_probe_json(tmp_path, capsys):
    avi, frames = _mk_avi(tmp_path)
    assert run(["-i", avi, "-probe", "-of", "json"]) == 0
    doc = json.loads(capsys.readouterr().out)
    s = doc["streams"][0]
    assert (s["width"], s["height"]) == (W, H)
    assert s["codec_name"] == "ffv1"
    assert s["slices"] == [2, 2]
    assert len(doc["packets"]) == len(frames)
    assert doc["packets"][0]["flags"] == "K"
    assert doc["packets"][1]["flags"] == "_"
