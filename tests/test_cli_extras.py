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


def test_transcode_preserves_source_format(tmp_path):
    """No -pix_fmt => the transcode keeps the source format (lossless
    semantics); previously it silently converted to yuv420p."""
    from tpu_ffv1.io.mkv import read_mkv
    from tpu_ffv1.codec.decoder import FFV1Decoder
    rng = np.random.RandomState(1)
    frames = [[rng.randint(0, 65536, (H, W)).astype(np.uint16)
               for _ in range(3)] for _ in range(2)]
    enc = FFV1Encoder(EncoderParams(width=W, height=H,
                                    pix_fmt="yuv444p16le", level=3,
                                    coder=2, slices=4))
    pkts = [enc.encode_frame(f) for f in frames]
    avi = str(tmp_path / "d16.avi")
    write_avi(avi, AviStream(width=W, height=H, extradata=enc.extradata,
                             packets=[p for p, _ in pkts],
                             keyflags=[k for _, k in pkts]))
    mkv = str(tmp_path / "d16.mkv")
    assert run(["-i", avi, "-c:v", "ffv1", "-level", "3", "-coder", "0",
                "-slices", "4", mkv]) == 0
    st = read_mkv(mkv)
    dec = FFV1Decoder(W, H, st.extradata)
    for fi, p in enumerate(st.packets):
        out, _ = dec.decode_frame(p)
        assert dec.pix_fmt == "yuv444p16le"
        for a, b in zip(out, frames[fi]):
            assert np.array_equal(a, b), fi


def test_y4m_to_raw_passthrough(tmp_path):
    """y4m input with a raw output is a conversion-only chain."""
    from tpu_ffv1.io.y4m import write_y4m
    rng = np.random.RandomState(3)
    frames = [[rng.randint(0, 255, (H, W)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
               rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)]
              for _ in range(3)]
    src = str(tmp_path / "a.y4m")
    out = str(tmp_path / "a.yuv")
    write_y4m(src, frames, "yuv420p", W, H)
    assert run(["-i", src, "-f", "rawvideo", out]) == 0
    got = read_frames(out, "yuv420p", W, H)
    for a, b in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_copy_honors_seek(tmp_path):
    """-c:v copy + -ss cuts at the nearest preceding keyframe."""
    from tpu_ffv1.io.avi import read_avi
    avi, frames = _mk_avi(tmp_path)          # keyframes at 0 and 3
    out = str(tmp_path / "cut.avi")
    assert run(["-i", avi, "-ss", "4", "-c:v", "copy", out]) == 0
    st_in = read_avi(avi)
    st_out = read_avi(out)
    assert st_out.packets == st_in.packets[3:]
    assert st_out.keyflags[0]


def test_serve_unrepresentable_y4m_is_clean_error(tmp_path):
    import threading
    import urllib.error
    import urllib.request
    from tpu_ffv1.cli.serve import make_server
    rng = np.random.RandomState(2)
    frames = [rng.randint(0, 255, (H, W, 4)).astype(np.uint8)
              for _ in range(2)]
    for f in frames:
        f[..., 3] = 0
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt="bgr0",
                                    level=3, coder=2, slices=4))
    pkts = [enc.encode_frame(f) for f in frames]
    avi = str(tmp_path / "rgb.avi")
    write_avi(avi, AviStream(width=W, height=H, extradata=enc.extradata,
                             packets=[p for p, _ in pkts],
                             keyflags=[k for _, k in pkts]))
    srv = make_server([avi])
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/rgb.y4m")
        assert ei.value.code == 415
    finally:
        srv.shutdown()
        srv.server_close()


def test_play_renders_ya8(tmp_path):
    import io
    from tpu_ffv1.cli.play import play
    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 255, (H, W, 2)).astype(np.uint8)
              for _ in range(2)]
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt="ya8",
                                    level=3, coder=2, slices=4))
    pkts = [enc.encode_frame(f) for f in frames]
    avi = str(tmp_path / "ya.avi")
    write_avi(avi, AviStream(width=W, height=H, extradata=enc.extradata,
                             packets=[p for p, _ in pkts],
                             keyflags=[k for _, k in pkts]))
    buf = io.StringIO()
    assert play([avi, "-fs", "40x12", "-vframes", "2"], out=buf) == 0
    assert "▀" in buf.getvalue()
