"""HTTP streaming server — the ffserver analog (reference: ffserver.c).

Registers media files as named feeds and serves them over HTTP:

  GET /                 status page (feed list + codec parameters), the
                        ffserver status-page analog (ffserver.c
                        compute_status)
  GET /<name>.y4m       the feed live-decoded to a YUV4MPEG2 stream
  GET /<name>.<ext>     the original container bytes (direct serving)

Decode happens lazily on first request and is cached per feed; streams
are generated with the same writers the CLI uses, so anything the
reference ffmpeg can read from disk it can also read off this socket
(e.g. ``ffmpeg -i http://host:port/clip.y4m``).

Usage:
  python -m tpu_ffv1.cli.serve -port 8090 clip.avi other.nut
"""
from __future__ import annotations

import argparse
import html
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_CTYPES = {".avi": "video/x-msvideo", ".nut": "video/x-nut",
           ".mkv": "video/x-matroska", ".y4m": "video/x-yuv4mpeg",
           ".webm": "video/webm"}


class _Feed:
    def __init__(self, path):
        self.path = path
        self.name = os.path.splitext(os.path.basename(path))[0]
        self.ext = os.path.splitext(path)[1].lower()
        self._decoded = None

    def decoded(self):
        """(frames, pix_fmt, w, h, fps) — lazily decoded, cached."""
        if self._decoded is None:
            from .play import _decode_from
            frames, fmt, w, h, fps, _ = _decode_from(self.path, 0)
            self._decoded = (frames, fmt, w, h, fps)
        return self._decoded

    def info(self):
        from .main import _is_y4m, _read_container
        if _is_y4m(self.path):
            from ..io.y4m import read_y4m
            frames, fmt, w, h, fps = read_y4m(self.path)
            return dict(kind="yuv4mpegpipe", w=w, h=h, fps=fps,
                        n=len(frames), codec=fmt)
        st, kind = _read_container(self.path)
        return dict(kind=kind, w=st.width, h=st.height, fps=st.fps,
                    n=len(st.packets), codec="ffv1")


class FFV1ServerHandler(BaseHTTPRequestHandler):
    feeds: dict = {}
    quiet = True

    def log_message(self, fmt, *a):       # ffserver logs to its own file
        if not self.quiet:
            super().log_message(fmt, *a)

    def _status_page(self):
        rows = []
        for f in self.feeds.values():
            try:
                i = f.info()
                name = html.escape(f.name, quote=True)
                ext = html.escape(f.ext, quote=True)
                rows.append(
                    f"<tr><td><a href='/{name}.y4m'>{name}.y4m</a> "
                    f"<a href='/{name}{ext}'>[{ext[1:]}]</a></td>"
                    f"<td>{html.escape(str(i['codec']))}</td>"
                    f"<td>{i['w']}x{i['h']}</td>"
                    f"<td>{i['fps'][0]}/{i['fps'][1]}</td>"
                    f"<td>{i['n']}</td></tr>")
            except Exception as e:   # still list broken feeds
                rows.append(f"<tr><td>{html.escape(f.name)}</td>"
                            f"<td colspan=4>error: {html.escape(str(e))}"
                            "</td></tr>")
        body = ("<html><head><title>tpu_ffv1 server status</title></head>"
                "<body><h1>tpu_ffv1 streaming server</h1>"
                "<table border=1><tr><th>feed</th><th>codec</th>"
                "<th>size</th><th>fps</th><th>frames</th></tr>"
                + "".join(rows) + "</table></body></html>").encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = self.path.split("?")[0]
        if path in ("/", "/status", "/status.html"):
            return self._status_page()
        stem, ext = os.path.splitext(path.lstrip("/"))
        feed = self.feeds.get(stem)
        if feed is None:
            self.send_error(404, "no such feed")
            return
        try:
            if ext == ".y4m" and feed.ext != ".y4m":
                # decode + validate representability BEFORE the status
                # line — a late failure would corrupt a 200 body with
                # an embedded 500
                frames, fmt, w, h, fps = feed.decoded()
                from ..codec.pixfmt import get_pix_fmt
                from ..io.y4m import _WRITE_TAGS, write_y4m_stream
                pf = get_pix_fmt(fmt)
                if _WRITE_TAGS.get(pf.name) is None or pf.transparency:
                    self.send_error(
                        415, f"pix_fmt {fmt} not representable in "
                             "yuv4mpegpipe")
                    return
                self.send_response(200)
                self.send_header("Content-Type", _CTYPES[".y4m"])
                self.end_headers()
                write_y4m_stream(self.wfile, frames, fmt, w, h, fps)
            elif ext == feed.ext or ext == "":
                with open(feed.path, "rb") as f:
                    data = f.read()
                self.send_response(200)
                self.send_header("Content-Type", _CTYPES.get(
                    feed.ext, "application/octet-stream"))
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self.send_error(404, f"feed {stem} has no {ext} form")
        except BrokenPipeError:
            pass   # client hung up mid-stream; ffserver ignores too
        except ValueError as e:
            self.send_error(500, str(e))


def make_server(files, bind="127.0.0.1", port=0, quiet=True):
    """Build (not start) the server; port 0 picks a free port (tests)."""
    handler = type("Handler", (FFV1ServerHandler,), {
        "feeds": {f.name: f for f in map(_Feed, files)},
        "quiet": quiet,
    })
    return ThreadingHTTPServer((bind, port), handler)


def serve(argv=None):
    p = argparse.ArgumentParser(
        prog="tpu_ffv1.serve", description="HTTP FFV1 streaming server")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-port", type=int, default=8090)
    # loopback by default: publishing the listed files on every
    # interface should be an explicit opt-in (-bind 0.0.0.0)
    p.add_argument("-bind", default="127.0.0.1")
    p.add_argument("-v", action="store_true", help="log requests")
    args = p.parse_args(argv)
    for f in args.inputs:
        if not os.path.exists(f):
            sys.exit(f"error: no such file: {f}")
    srv = make_server(args.inputs, args.bind, args.port,
                      quiet=not args.v)
    host, port = srv.server_address[:2]
    print(f"serving {len(args.inputs)} feed(s) on http://{host}:{port}/ "
          "(status page at /)", file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(serve())
