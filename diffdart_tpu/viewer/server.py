"""Live WebSocket GUI server — stdlib-only (no websockets/asio dependency).

Capability parity with server::GUIWebsocketServer (dart/server/
GUIWebsocketServer.cpp anchors serve(port)/renderWorld — SURVEY.md §2.3):
serves the viewer page over HTTP and streams scene + frame JSON over a
hand-rolled RFC6455 WebSocket (text frames, no extensions). Runs in a
background thread; `renderWorld(q)` is non-blocking from the sim loop.
"""
from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading

from diffdart_tpu.viewer.client import build_page
from diffdart_tpu.viewer.protocol import scene_description, state_frame

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _ws_accept_key(key: str) -> str:
    return base64.b64encode(hashlib.sha1((key + _WS_MAGIC).encode()).digest()).decode()


def _ws_frame(payload: bytes) -> bytes:
    """Server->client text frame (FIN, opcode 1, unmasked)."""
    n = len(payload)
    if n < 126:
        header = struct.pack("!BB", 0x81, n)
    elif n < 1 << 16:
        header = struct.pack("!BBH", 0x81, 126, n)
    else:
        header = struct.pack("!BBQ", 0x81, 127, n)
    return header + payload


class GUIWebsocketServer:
    """serve(port) then renderWorld(model, q) each step (or as often as you
    like); browsers at http://host:port see the live world."""

    def __init__(self):
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._scene_msg: bytes | None = None
        self._model = None
        self._srv: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self._running = False
        self.port = None

    # -- public API (reference GUIWebsocketServer parity) -------------------
    def serve(self, port: int = 8070, host: str = "127.0.0.1"):
        # loopback by default: this is an unauthenticated dev server; pass
        # host="0.0.0.0" explicitly to expose it beyond the local machine
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._running = True
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._running = False
        if self._srv is not None:
            try:
                self._srv.close()
            except OSError:
                pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()

    def renderWorld(self, model, q, t=0.0):
        """Send the current world state to all connected clients."""
        if model is not self._model:
            self._model = model
            self._scene_msg = _ws_frame(json.dumps(scene_description(model)).encode())
            self._broadcast(self._scene_msg)
        frame = _ws_frame(json.dumps(state_frame(model, q, t)).encode())
        self._broadcast(frame)

    # -- internals ----------------------------------------------------------
    def _broadcast(self, data: bytes):
        dead = []
        with self._lock:
            for c in self._clients:
                try:
                    c.sendall(data)
                except OSError:
                    dead.append(c)
            for c in dead:
                self._clients.remove(c)

    def _accept_loop(self):
        while self._running:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket):
        try:
            req = conn.recv(8192).decode("latin1")
        except OSError:
            return
        headers = {}
        for line in req.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        if headers.get("upgrade", "").lower() == "websocket":
            key = headers.get("sec-websocket-key", "")
            resp = (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {_ws_accept_key(key)}\r\n\r\n"
            )
            conn.sendall(resp.encode())
            with self._lock:
                self._clients.append(conn)
            if self._scene_msg is not None:
                try:
                    conn.sendall(self._scene_msg)
                except OSError:
                    pass
        else:
            # HTTP: serve the viewer page pointed at our own websocket
            page = build_page("null", "[]", '"ws://" + location.host + "/"').encode()
            resp = (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(page)}\r\nConnection: close\r\n\r\n"
            ).encode() + page
            try:
                conn.sendall(resp)
            finally:
                conn.close()
