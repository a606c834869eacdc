"""ffplay / ffserver analogs (reference: ffplay.c, ffserver.c).

The player renders decoded frames as ANSI half-blocks and honors
keyframe-accurate seek; the server streams feeds over HTTP (status
page, live-decoded y4m, original container bytes).
"""
import io
import threading
import urllib.request

import numpy as np
import pytest

from tpu_ffv1.codec.encoder import FFV1Encoder
from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.io.avi import AviStream, write_avi


W, H = 48, 32


def _frames(n=6, seed=0):
    rng = np.random.RandomState(seed)
    return [[(np.add.outer(np.arange(H), np.arange(W)) * 3 + 40 * t)
             .astype(np.uint8),
             rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8),
             rng.randint(0, 255, (H // 2, W // 2)).astype(np.uint8)]
            for t in range(n)]


@pytest.fixture
def avi_path(tmp_path):
    frames = _frames()
    enc = FFV1Encoder(EncoderParams(width=W, height=H, pix_fmt="yuv420p",
                                    level=3, coder=2, slices=4,
                                    gop_size=3))
    pkts = [enc.encode_frame(f) for f in frames]
    p = str(tmp_path / "clip.avi")
    write_avi(p, AviStream(width=W, height=H, extradata=enc.extradata,
                           packets=[pk for pk, _ in pkts],
                           keyflags=[k for _, k in pkts]))
    return p, frames


def test_play_renders_ansi(avi_path):
    from tpu_ffv1.cli.play import play
    path, _ = avi_path
    buf = io.StringIO()
    assert play([path, "-fs", "40x12", "-vframes", "2"], out=buf) == 0
    s = buf.getvalue()
    assert s.startswith("\x1b[2J")          # clear screen
    assert s.count("\x1b[H") == 2           # one home per frame
    assert "\x1b[38;2;" in s and "▀" in s   # truecolor half-blocks


def test_play_nodisp_and_seek(avi_path, capsys):
    from tpu_ffv1.cli.play import play, seek_start
    path, _ = avi_path
    # gop_size=3 -> keyframes at 0 and 3
    assert seek_start([True, False, False, True, False, False], 4) == 3
    buf = io.StringIO()
    assert play([path, "-nodisp", "-ss", "4"], out=buf) == 0
    err = capsys.readouterr().err
    assert "2 frames" in err                # frames 4..5
    assert "via keyframe 3" in err


def test_play_seek_frames_match_linear_decode(avi_path):
    """Seeked playback shows the same pixels as a full linear decode."""
    from tpu_ffv1.cli.play import _decode_from
    path, frames = avi_path
    got, fmt, w, h, _fps, start = _decode_from(path, 4)
    assert (w, h, start) == (W, H, 3)
    assert len(got) == 2
    for a, b in zip(got, frames[4:]):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_serve_status_y4m_and_container(avi_path):
    from tpu_ffv1.cli.serve import make_server
    from tpu_ffv1.io.y4m import read_y4m
    path, frames = avi_path
    srv = make_server([path])
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        status = urllib.request.urlopen(f"{base}/").read().decode()
        assert "clip.y4m" in status and f"{W}x{H}" in status
        # live-decoded y4m stream == source frames
        y4m = urllib.request.urlopen(f"{base}/clip.y4m").read()
        import tempfile, os
        fd, tmp = tempfile.mkstemp(suffix=".y4m")
        with os.fdopen(fd, "wb") as f:
            f.write(y4m)
        try:
            got, fmt, w, h, _ = read_y4m(tmp)
        finally:
            os.unlink(tmp)
        assert (fmt, w, h) == ("yuv420p", W, H)
        assert len(got) == len(frames)
        for a, b in zip(got, frames):
            for x, y in zip(a, b):
                assert np.array_equal(x, y)
        # original container bytes served verbatim
        raw = urllib.request.urlopen(f"{base}/clip.avi").read()
        with open(path, "rb") as f:
            assert raw == f.read()
        # unknown feed -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope.y4m")
        assert ei.value.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
