"""Viewer: protocol serialization, offline HTML export, live websocket server
(GUIWebsocketServer parity — SURVEY.md §2.3)."""
import base64
import hashlib
import json
import os
import socket
import struct

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.models import cube_drop
from diffdart_tpu.dynamics.model import make_state
from diffdart_tpu.sim import rollout
from diffdart_tpu.viewer import GUIWebsocketServer, save_html, scene_description, state_frame


class TestProtocol:
    def test_scene_and_frame(self):
        m = cube_drop()
        scene = scene_description(m)
        assert scene["kind"] == "scene"
        assert len(scene["geoms"]) == m.ngeom
        assert scene["geoms"][0]["type"] == "plane"
        f = state_frame(m, m.neutral_q().at[6].set(0.5))
        assert f["kind"] == "frame"
        assert len(f["poses"]) == m.ngeom
        np.testing.assert_allclose(f["poses"][1]["pos"], [0, 0, 0.5], atol=1e-4)

    def test_save_html(self, tmp_path):
        m = cube_drop(dt=2e-3)
        s = make_state(m, q=m.neutral_q().at[6].set(0.3))
        _, traj = jax.jit(rollout)(m, s, jnp.zeros((50, 6)))
        path = save_html(m, traj.q, str(tmp_path / "replay.html"), stride=5)
        html = open(path).read()
        assert "frames = [{" in html or '"kind": "frame"' in html
        assert "<canvas" in html


class TestWebsocketServer:
    def test_http_serves_page(self):
        srv = GUIWebsocketServer().serve(port=0, host="127.0.0.1")
        try:
            c = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
            c.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
            data = b""
            while b"</html>" not in data:
                chunk = c.recv(65536)
                if not chunk:
                    break
                data += chunk
            assert b"200 OK" in data
            assert b"diffdart_tpu viewer" in data
            c.close()
        finally:
            srv.stop()

    def test_websocket_stream(self):
        m = cube_drop()
        srv = GUIWebsocketServer().serve(port=0, host="127.0.0.1")
        try:
            c = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
            key = base64.b64encode(os.urandom(16)).decode()
            c.sendall(
                (
                    "GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
                ).encode()
            )
            resp = c.recv(4096)
            assert b"101" in resp
            expect = base64.b64encode(
                hashlib.sha1((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()).digest()
            )
            assert expect in resp
            # push a frame from the "sim loop"
            import time

            time.sleep(0.1)
            srv.renderWorld(m, m.neutral_q().at[6].set(0.42), t=0.0)
            msgs = _read_ws_messages(c, 2)
            kinds = [json.loads(p)["kind"] for p in msgs]
            assert kinds == ["scene", "frame"]
            frame = json.loads(msgs[1])
            np.testing.assert_allclose(frame["poses"][1]["pos"][2], 0.42, atol=1e-4)
            c.close()
        finally:
            srv.stop()


def _read_ws_messages(sock, n, timeout=5.0):
    sock.settimeout(timeout)
    buf = b""
    out = []
    while len(out) < n:
        buf += sock.recv(65536)
        while len(buf) >= 2:
            ln = buf[1] & 0x7F
            off = 2
            if ln == 126:
                ln = struct.unpack("!H", buf[2:4])[0]
                off = 4
            elif ln == 127:
                ln = struct.unpack("!Q", buf[2:10])[0]
                off = 10
            if len(buf) < off + ln:
                break
            out.append(buf[off : off + ln].decode())
            buf = buf[off + ln :]
    return out


def _ws_handshake(port):
    c = socket.create_connection(("127.0.0.1", port), timeout=5)
    key = base64.b64encode(os.urandom(16)).decode()
    c.sendall(
        (
            "GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    assert b"101" in c.recv(4096)
    return c


def _ws_send_text(sock, payload: str):
    """Client->server frame (masked, per RFC6455)."""
    data = payload.encode()
    mask = os.urandom(4)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    n = len(data)
    if n < 126:
        header = struct.pack("!BB", 0x81, 0x80 | n)
    else:
        header = struct.pack("!BBH", 0x81, 0x80 | 126, n)
    sock.sendall(header + mask + masked)


class TestInteraction:
    def test_drag_roundtrip_changes_sim_state(self):
        """Client drag message -> server listener + consume_drag_forces ->
        applied as a generalized force that changes the next sim state
        (GUIWebsocketServer interaction parity)."""
        import time

        m = cube_drop(dt=2e-3)
        srv = GUIWebsocketServer().serve(port=0, host="127.0.0.1")
        got = []
        srv.registerDragListener(lambda body, force: got.append((body, force)))
        try:
            c = _ws_handshake(srv.port)
            _ws_send_text(c, json.dumps({"type": "drag", "body": 0, "force": [5.0, 0.0, 0.0]}))
            for _ in range(100):
                if got:
                    break
                time.sleep(0.02)
            assert got and got[0][0] == 0 and got[0][1][0] == 5.0

            # drain into a force array and step the sim with vs without it
            f = srv.consume_drag_forces(m)
            np.testing.assert_allclose(f[0], [5.0, 0.0, 0.0])
            assert srv.consume_drag_forces(m)[0][0] == 0.0  # one-shot

            from diffdart_tpu.sim import step

            s = make_state(m, q=m.neutral_q().at[6].set(0.1))
            tau = jnp.zeros(m.nv, m.mass.dtype).at[3].set(float(f[0][0]))  # free-joint x
            s_pushed = step(m, s, tau)
            s_plain = step(m, s)
            assert float(s_pushed.v[3]) > float(s_plain.v[3]) + 1e-6
            c.close()
        finally:
            srv.stop()

    def test_keydown_listener(self):
        import time

        srv = GUIWebsocketServer().serve(port=0, host="127.0.0.1")
        keys = []
        srv.registerKeydownListener(keys.append)
        try:
            c = _ws_handshake(srv.port)
            _ws_send_text(c, json.dumps({"type": "key", "key": "w"}))
            for _ in range(100):
                if keys:
                    break
                time.sleep(0.02)
            assert keys == ["w"]
            c.close()
        finally:
            srv.stop()

    def test_render_trajectory_broadcast(self):
        import time

        m = cube_drop(dt=2e-3)
        srv = GUIWebsocketServer().serve(port=0, host="127.0.0.1")
        try:
            c = _ws_handshake(srv.port)
            time.sleep(0.1)
            qs = [np.array(m.neutral_q()), np.array(m.neutral_q())]
            qs[1][6] = 0.4
            srv.renderTrajectory(m, qs, tag="iterate_3")
            msgs = _read_ws_messages(c, 2)
            kinds = [json.loads(p)["kind"] for p in msgs]
            assert kinds == ["scene", "trajectory"]
            traj = json.loads(msgs[1])
            assert traj["tag"] == "iterate_3"
            assert len(traj["frames"]) == 2
            np.testing.assert_allclose(traj["frames"][1][1]["pos"][2], 0.4, atol=1e-4)
            c.close()
        finally:
            srv.stop()
