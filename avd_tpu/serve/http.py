"""Minimal HTTP server framework (stdlib only).

Provides what the reference gets from FastAPI (api.py:29-37,213-266):
routing, CORS middleware, JSON responses, HTTPException-style error
shortcuts, and — the part that matters for large uploads — a *streaming*
multipart/form-data parser that spools file parts to disk in 1 MiB chunks
with a hard size cap, mirroring ``_save_upload_to_tmp`` (api.py:91-108).
"""

from __future__ import annotations

import json
import os
import socketserver
import tempfile
import traceback
from http.server import BaseHTTPRequestHandler
from typing import Any, Callable, Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse


class HTTPError(Exception):
    """FastAPI-HTTPException equivalent: status + JSON detail."""

    def __init__(self, status: int, detail: Any):
        super().__init__(str(detail))
        self.status = status
        self.detail = detail


class UploadedFile:
    """A multipart file part spooled to a temp file."""

    def __init__(self, filename: str, path: str, size: int):
        self.filename = filename
        self.path = path
        self.size = size

    def unlink(self) -> None:
        try:
            os.unlink(self.path)
        except OSError:
            pass


class Request:
    def __init__(self, method: str, path: str, query: Dict[str, str],
                 headers, body_stream, content_length: int):
        self.method = method
        self.path = path
        self.query = query
        self.headers = headers
        self._stream = body_stream
        self.content_length = content_length
        self._body: Optional[bytes] = None

    def body(self, limit: int = 10 * 1024 * 1024) -> bytes:
        if self._body is None:
            n = min(self.content_length, limit)
            self._body = self._stream.read(n) if n > 0 else b""
        return self._body


_CHUNK = 1024 * 1024  # 1 MiB spool chunks (api.py:96)


def parse_multipart(req: Request, max_file_bytes: int,
                    too_large_detail: Callable[[], Any]):
    """Stream a multipart/form-data body.

    Returns (files: {name: UploadedFile}, fields: {name: str}).  File parts
    stream to NamedTemporaryFiles in 1 MiB chunks; exceeding
    ``max_file_bytes`` raises HTTPError 413 with the reference's Italian
    detail (api.py:101-102) after cleaning up the spool file.
    """
    ctype = req.headers.get("Content-Type", "")
    if "multipart/form-data" not in ctype or "boundary=" not in ctype:
        raise HTTPError(422, {"error": "Content-Type multipart/form-data richiesto"})
    boundary = ctype.split("boundary=", 1)[1].strip().strip('"')
    delim = b"--" + boundary.encode()

    remaining = req.content_length
    stream = req._stream
    buf = b""
    files: Dict[str, UploadedFile] = {}
    fields: Dict[str, str] = {}

    def fill(n: int = _CHUNK) -> bool:
        nonlocal buf, remaining
        if remaining <= 0:
            return False
        chunk = stream.read(min(n, remaining))
        if not chunk:
            remaining = 0
            return False
        remaining -= len(chunk)
        buf += chunk
        return True

    # scan to the first boundary
    while delim not in buf and fill():
        pass
    if delim not in buf:
        raise HTTPError(422, {"error": "Corpo multipart non valido"})
    buf = buf.split(delim, 1)[1]

    try:
        while True:
            # boundary suffix: "--" = end, CRLF = next part
            while len(buf) < 2 and fill():
                pass
            if buf.startswith(b"--"):
                break
            buf = buf.lstrip(b"\r\n")
            # headers
            while b"\r\n\r\n" not in buf and fill():
                pass
            if b"\r\n\r\n" not in buf:
                break
            raw_hdr, buf = buf.split(b"\r\n\r\n", 1)
            disp: Dict[str, str] = {}
            for line in raw_hdr.decode("latin-1").split("\r\n"):
                if ":" not in line:
                    continue
                k, v = line.split(":", 1)
                if k.strip().lower() == "content-disposition":
                    for item in v.split(";"):
                        item = item.strip()
                        if "=" in item:
                            ik, iv = item.split("=", 1)
                            disp[ik.strip()] = iv.strip().strip('"')
            name = disp.get("name", "")
            filename = disp.get("filename")

            marker = b"\r\n" + delim
            if filename is not None:
                suffix = os.path.splitext(filename)[1] or ".bin"
                tmp = tempfile.NamedTemporaryFile(delete=False, suffix=suffix)
                size = 0
                try:
                    while True:
                        idx = buf.find(marker)
                        if idx >= 0:
                            tmp.write(buf[:idx])
                            size += idx
                            if size > max_file_bytes:
                                raise HTTPError(413, too_large_detail())
                            buf = buf[idx + len(marker):]
                            break
                        # keep a marker-sized tail to avoid splitting it
                        emit = buf[:-len(marker)] if len(buf) > len(marker) \
                            else b""
                        tmp.write(emit)
                        size += len(emit)
                        if size > max_file_bytes:
                            raise HTTPError(413, too_large_detail())
                        buf = buf[len(emit):]
                        if not fill():
                            tmp.write(buf)
                            size += len(buf)
                            buf = b""
                            break
                    tmp.close()
                except BaseException:
                    tmp.close()
                    try:
                        os.unlink(tmp.name)
                    except OSError:
                        pass
                    raise
                files[name] = UploadedFile(filename, tmp.name, size)
            else:
                while marker not in buf and fill():
                    pass
                idx = buf.find(marker)
                if idx < 0:
                    value, buf = buf, b""
                else:
                    value, buf = buf[:idx], buf[idx + len(marker):]
                fields[name] = value.decode("utf-8", "ignore")
    except HTTPError:
        for f in files.values():
            f.unlink()
        raise
    return files, fields


class Response:
    def __init__(self, content: Any = None, status: int = 200,
                 headers: Optional[Dict[str, str]] = None,
                 raw: Optional[bytes] = None):
        self.status = status
        self.headers = headers or {}
        if raw is not None:
            self.body = raw
        elif content is None:
            self.body = b""
        else:
            self.body = json.dumps(content).encode()
            self.headers.setdefault("Content-Type", "application/json")


class App:
    """Route table + CORS + error handling."""

    def __init__(self, allowed_origins: str = "*", debug: bool = False):
        self._routes: Dict[Tuple[str, str], Callable] = {}
        self._options_handler: Optional[Callable] = None
        self.allowed_origins = [o.strip() for o in allowed_origins.split(",")
                                if o.strip()] or ["*"]
        self.debug = debug

    def route(self, method: str, path: str):
        def deco(fn):
            self._routes[(method.upper(), path)] = fn
            return fn
        return deco

    def options_catchall(self, fn):
        self._options_handler = fn
        return fn

    def _cors_headers(self, origin: Optional[str]) -> Dict[str, str]:
        allow = "*"
        if "*" not in self.allowed_origins:
            allow = origin if origin in self.allowed_origins else \
                self.allowed_origins[0]
        return {
            "Access-Control-Allow-Origin": allow,
            "Access-Control-Allow-Credentials": "true",
            "Access-Control-Allow-Methods": "*",
            "Access-Control-Allow-Headers": "*",
        }

    def dispatch(self, req: Request) -> Response:
        origin = req.headers.get("Origin")
        cors = self._cors_headers(origin)
        try:
            if req.method == "OPTIONS":
                resp = (self._options_handler(req) if self._options_handler
                        else Response(status=204))
            else:
                handler = self._routes.get((req.method, req.path))
                if handler is None:
                    if any(p == req.path for _, p in self._routes):
                        # path exists under another method (FastAPI: 405)
                        resp = Response({"detail": "Method Not Allowed"},
                                        status=405)
                    else:
                        resp = Response({"detail": "Not Found"}, status=404)
                else:
                    resp = handler(req)
        except HTTPError as e:
            resp = Response({"detail": e.detail}, status=e.status)
        except Exception as e:
            # global exception handler (api.py:269-280)
            if self.debug:
                resp = Response({"ok": False, "detail": {
                    "error": str(e),
                    "exception": e.__class__.__name__,
                    "traceback": traceback.format_exc(),
                }}, status=500)
            else:
                resp = Response(
                    {"ok": False,
                     "detail": {"error": "Internal server error"}},
                    status=500)
        resp.headers.update(cors)
        return resp


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    app: App = None  # set by make_server

    def _handle(self):
        parsed = urlparse(self.path)
        query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        length = int(self.headers.get("Content-Length") or 0)
        req = Request(self.command, parsed.path, query, self.headers,
                      self.rfile, length)
        resp = self.app.dispatch(req)
        try:
            self.send_response(resp.status)
            for k, v in resp.headers.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(resp.body)))
            self.end_headers()
            if resp.body:
                self.wfile.write(resp.body)
        except (BrokenPipeError, ConnectionResetError):
            pass

    do_GET = do_POST = do_PUT = do_DELETE = do_OPTIONS = do_HEAD = _handle

    def log_message(self, fmt, *args):  # access log to stdout
        print(f'{self.address_string()} - "{fmt % args}"', flush=True)


class ThreadingHTTPServer(socketserver.ThreadingMixIn,
                          socketserver.TCPServer):
    daemon_threads = True
    allow_reuse_address = True


def make_server(app: App, host: str, port: int,
                reuse_port: bool = False) -> ThreadingHTTPServer:
    import socket as _socket

    handler = type("BoundHandler", (_Handler,), {"app": app})

    class _Server(ThreadingHTTPServer):
        def server_bind(self):
            if reuse_port and hasattr(_socket, "SO_REUSEPORT"):
                # pre-fork workers all bind the same port (master.py)
                self.socket.setsockopt(_socket.SOL_SOCKET,
                                       _socket.SO_REUSEPORT, 1)
            super().server_bind()

    return _Server((host, port), handler)
