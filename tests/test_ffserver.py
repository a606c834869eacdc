"""ffserver-analog feed machinery: config parsing, live ingest, and
multi-client fanout (reference: ffserver.c, ffserver_config.c)."""
import http.client
import io
import socket
import threading
import time

import numpy as np
import pytest

from tpu_ffv1.cli.ffserver_conf import parse_config
from tpu_ffv1.cli.serve import make_server

W, H = 64, 48


# ---------------------------------------------------------------------
# config parser (ffserver_config.c parse_ffconfig)
# ---------------------------------------------------------------------

def test_config_parses_sections_and_directives():
    cfg = parse_config("""
# comment
HTTPPort 9090
MaxClients 7
MaxBandwidth 2000
CustomLog /tmp/srv.log

<Feed feed1.ffm>
FileMaxSize 2M
ACL allow 127.0.0.1
</Feed>

<Stream live.nut>
Feed feed1.ffm
VideoCodec ffv1
AVOptionVideo slices 4
AVOptionVideo coder 2
VideoGopSize 6
StartSendOnKey
Preroll 2
Author me
</Stream>

<Stream live.y4m>
Feed feed1.ffm
</Stream>

<Redirect index.html>
URL http://example.com/
</Redirect>
""")
    assert cfg.port == 9090 and cfg.max_clients == 7
    assert cfg.max_bandwidth == 2000
    assert cfg.custom_log == "/tmp/srv.log"
    f = cfg.feeds["feed1.ffm"]
    assert f.max_size == 2 * 1024 ** 2          # K/M/G suffix scaling
    assert f.acl == [("allow", "127.0.0.1")]
    s = cfg.streams["live.nut"]
    assert s.feed == "feed1.ffm" and s.fmt == "nut"
    assert s.options == {"slices": 4, "coder": 2}
    assert s.gop_size == 6 and s.send_on_key and s.preroll == 2.0
    assert s.metadata["author"] == "me"
    assert cfg.streams["live.y4m"].fmt == "y4m"
    assert cfg.redirects["index.html"].url == "http://example.com/"


def test_config_errors_accumulate_and_name_lines():
    # like the reference's ERROR macro: every problem reported, parse
    # fails once at the end (ffserver_config.c:1185-1230)
    with pytest.raises(ValueError) as ei:
        parse_config("""Bogus 1
<Stream x.nut>
Feed nosuch
NoVideo
</Stream>
<Feed a>
</Feed>
<Feed a>
</Feed>
MaxBandwidth 5
""")
    msg = str(ei.value)
    assert "line 1" in msg and "Bogus" in msg
    assert "nosuch" in msg
    assert "NoVideo" in msg
    assert "already registered" in msg
    assert "MaxBandwidth" in msg


def test_config_rejects_unclosed_and_unknown_codec():
    with pytest.raises(ValueError, match="unclosed"):
        parse_config("<Feed f>\n")
    with pytest.raises(ValueError, match="unknown video codec"):
        parse_config("<Stream s.nut>\nFile /tmp/x\nVideoCodec h264\n"
                     "</Stream>")
    with pytest.raises(ValueError, match="neither Feed nor File"):
        parse_config("<Stream s.nut>\n</Stream>")


# ---------------------------------------------------------------------
# live feed end-to-end
# ---------------------------------------------------------------------

CONF = """
MaxClients 4
<Feed cam.ffm>
FileMaxSize 4M
</Feed>
<Stream live.nut>
Feed cam.ffm
AVOptionVideo slices 4
VideoGopSize 3
</Stream>
<Stream live.y4m>
Feed cam.ffm
Preroll 10
</Stream>
"""


def _frames(n, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (H + 2 * n, W + 2 * n)).astype(np.uint8)
    out = []
    for t in range(n):
        y = base[t:t + H, 2 * t:2 * t + W].copy()
        u = np.full((H // 2, W // 2), 100 + t, np.uint8)
        v = np.full((H // 2, W // 2), 160, np.uint8)
        out.append([y, u, v])
    return out


def _y4m_bytes(frames):
    from tpu_ffv1.io.y4m import write_y4m_stream
    buf = io.BytesIO()
    write_y4m_stream(buf, frames, "yuv420p", W, H, (25, 1))
    return buf.getvalue()


def _post_y4m(port, feed, payload, chunk=None):
    """POST a y4m stream over a raw socket (identity framing, like an
    ffmpeg feeder piping into the server)."""
    sk = socket.create_connection(("127.0.0.1", port), timeout=30)
    try:
        sk.sendall(f"POST /{feed} HTTP/1.1\r\nHost: t\r\n"
                   f"Content-Length: {len(payload)}\r\n\r\n".encode())
        if chunk:
            for i in range(0, len(payload), chunk):
                sk.sendall(payload[i:i + chunk])
                time.sleep(0.002)
        else:
            sk.sendall(payload)
        resp = b""
        sk.settimeout(30)
        while b"\r\n\r\n" not in resp:
            b = sk.recv(4096)
            if not b:
                break
            resp += b
        return resp
    finally:
        sk.close()


@pytest.fixture()
def live_server():
    cfg = parse_config(CONF)
    srv = make_server(config=cfg, port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def test_live_feed_two_concurrent_nut_clients(live_server):
    """Publisher POSTs 6 frames; two clients pull /live.nut
    concurrently and each must decode ALL frames losslessly (the
    multi-client fanout ffserver's feed distribution provides)."""
    from tpu_ffv1.io.nut import read_nut
    port = live_server.server_address[1]
    frames = _frames(6)
    payload = _y4m_bytes(frames)

    got = {}

    def client(name):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/live.nut")
        r = conn.getresponse()
        got[name] = (r.status, r.read())
        conn.close()

    # slow-ish publish so clients join while the feed is live
    pub = threading.Thread(target=_post_y4m,
                           args=(port, "cam.ffm", payload, 4096))
    pub.start()
    time.sleep(0.3)      # let the header + first GOP land
    t1 = threading.Thread(target=client, args=("a",))
    t2 = threading.Thread(target=client, args=("b",))
    t1.start(); t2.start()
    pub.join(); t1.join(); t2.join()

    from tpu_ffv1 import FFV1Decoder
    for name, (status, body) in got.items():
        assert status == 200, name
        with open(f"/tmp/live_{name}.nut", "wb") as f:
            f.write(body)
        st = read_nut(f"/tmp/live_{name}.nut")
        dec = FFV1Decoder(W, H, st.extradata)
        # clients join at a keyframe; every received frame must decode
        # to a bit-exact source frame
        n = 0
        for i, pkt in enumerate(st.packets):
            planes, _ = dec.decode_frame(pkt)
            match = any(
                all(np.array_equal(np.asarray(a), b)
                    for a, b in zip(planes, fr))
                for fr in frames)
            assert match, (name, i)
            n += 1
        assert n >= 3, name    # at least the final GOP


def test_live_feed_y4m_roundtrip(live_server):
    """GET /live.y4m decodes the feed back to YUV4MPEG2; frames are
    bit-exact vs what the publisher sent."""
    port = live_server.server_address[1]
    frames = _frames(5, seed=4)
    payload = _y4m_bytes(frames)

    got = {}

    def client():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/live.y4m")
        r = conn.getresponse()
        got["y"] = (r.status, r.read())
        conn.close()

    pub = threading.Thread(target=_post_y4m,
                           args=(port, "cam.ffm", payload, 4096))
    pub.start()
    time.sleep(0.3)
    th = threading.Thread(target=client)
    th.start()
    pub.join(); th.join()

    status, body = got["y"]
    assert status == 200
    with open("/tmp/live_y.y4m", "wb") as f:
        f.write(body)
    from tpu_ffv1.io.y4m import read_y4m
    out, fmt, w, h, fps = read_y4m("/tmp/live_y.y4m")
    assert (fmt, w, h) == ("yuv420p", W, H)
    # Preroll 10s rewinds to the oldest buffered keyframe -> the whole
    # publish is replayed, bit-exact and in order
    assert len(out) == len(frames)
    for i, planes in enumerate(out):
        assert all(np.array_equal(a, b)
                   for a, b in zip(planes, frames[i])), i


def test_ring_eviction_keeps_keyframe_reachable():
    """A tiny FileMaxSize forces eviction; the ring must always start
    at a keyframe (the lapped-reader restart point) and never evict the
    only remaining GOP."""
    from tpu_ffv1.cli.ffserver_conf import FeedConfig
    from tpu_ffv1.cli.serve import LiveFeed
    feed = LiveFeed(FeedConfig(name="t", max_size=3000))
    feed.begin(W, H, "yuv420p", (25, 1), b"x")
    rng = np.random.RandomState(0)
    for i in range(20):
        feed.push(rng.bytes(500), i % 4 == 0)
    assert feed.ring[0][2], "ring must start at a keyframe"
    assert feed.nbytes <= 3000 + 4 * 500   # at most one extra GOP
    # degenerate: single huge GOP is never evicted
    feed2 = LiveFeed(FeedConfig(name="u", max_size=100))
    feed2.begin(W, H, "yuv420p", (25, 1), b"x")
    feed2.push(b"k" * 50, True)
    for _ in range(10):
        feed2.push(b"p" * 50, False)
    assert len(feed2.ring) == 11


def test_feed_acl_denies(live_server):
    cfg = parse_config("""
<Feed sec.ffm>
ACL deny 127.0.0.1
</Feed>
<Stream s.nut>
Feed sec.ffm
</Stream>
""")
    srv = make_server(config=cfg, port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        port = srv.server_address[1]
        resp = _post_y4m(port, "sec.ffm", _y4m_bytes(_frames(1)))
        assert b"403" in resp.split(b"\r\n")[0]
    finally:
        srv.shutdown()
        srv.server_close()


def test_max_clients_503():
    """MaxClients 1: while one client holds the live stream open, a
    second media request gets 503 (ffserver.c:1557 "too many
    clients"); after the first finishes, the slot frees up."""
    cfg = parse_config("MaxClients 1\n" + CONF.split("\n", 2)[2])
    srv = make_server(config=cfg, port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        port = srv.server_address[1]
        handler = srv.RequestHandlerClass
        frames = _frames(24, seed=5)
        payload = _y4m_bytes(frames)
        # slow publisher keeps the feed live so client 1's stream stays
        # open (it blocks in read_from waiting for more packets)
        pub = threading.Thread(target=_post_y4m,
                               args=(port, "cam.ffm", payload, 256))
        pub.start()
        feed = handler.live_feeds["cam.ffm"]
        for _ in range(500):
            if feed.ring:
                break
            time.sleep(0.01)
        assert feed.ring

        statuses = {}

        def holder():
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=60)
            conn.request("GET", "/live.nut")
            r = conn.getresponse()
            statuses["first"] = r.status
            r.read()          # blocks until the publisher finishes
            conn.close()

        t = threading.Thread(target=holder)
        t.start()
        for _ in range(500):      # wait for admission
            if handler.media_clients[0] >= 1:
                break
            time.sleep(0.01)
        assert handler.media_clients[0] == 1
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/live.nut")
        r = conn.getresponse()
        statuses["second"] = r.status
        r.read()
        conn.close()
        pub.join(); t.join()
        assert statuses["first"] == 200
        assert statuses["second"] == 503
        # slot freed: a fresh client is admitted again
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/live.nut")
        r = conn.getresponse()
        assert r.status == 200
        r.read()
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_redirect_and_status_page(live_server):
    cfg = parse_config(CONF + """
<Redirect go.html>
URL http://example.org/x
</Redirect>
""")
    srv = make_server(config=cfg, port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        port = srv.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/go.html")
        r = conn.getresponse()
        assert r.status == 302
        assert r.getheader("Location") == "http://example.org/x"
        r.read()
        conn.request("GET", "/")
        r = conn.getresponse()
        body = r.read().decode()
        assert r.status == 200
        assert "live.nut" in body and "cam.ffm" in body
        assert "connections" in body and "bandwidth" in body
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_post_to_unknown_feed_404(live_server):
    port = live_server.server_address[1]
    resp = _post_y4m(port, "nosuch.ffm", _y4m_bytes(_frames(1)))
    assert b"404" in resp.split(b"\r\n")[0]


def test_second_publisher_conflicts_409(live_server):
    port = live_server.server_address[1]
    frames = _frames(8, seed=6)
    payload = _y4m_bytes(frames)
    r1 = {}

    def pub1():
        r1["resp"] = _post_y4m(port, "cam.ffm", payload, chunk=256)

    t = threading.Thread(target=pub1)
    t.start()
    feed = live_server.RequestHandlerClass.live_feeds["cam.ffm"]
    for _ in range(300):      # wait until pub1 is mid-stream
        if feed.publishing:
            break
        time.sleep(0.01)
    assert feed.publishing
    resp2 = _post_y4m(port, "cam.ffm", payload)
    t.join()
    assert b"200" in r1["resp"].split(b"\r\n")[0]
    assert b"409" in resp2.split(b"\r\n")[0]
