"""TCP control plane round trip: the reference's Trigger-service verbs
(start/stop/process, README.md:7-10) over the line-JSON protocol plus the
binary frame ingest (runtime/cli.py serve)."""

import json
import socket
import socketserver
import threading

import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.runtime.cli import _ControlHandler
from hifi_fusion_tpu.runtime.session import FusionSession


def _send(f, obj):
    f.sendall((json.dumps(obj) + "\n").encode())


def _recv(rf):
    return json.loads(rf.readline())


def test_serve_roundtrip(tmp_path):
    cfg = small_test_config(refine_every=1)
    session = FusionSession(cfg, output_dir=str(tmp_path))
    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0),
                                             _ControlHandler)
    server.daemon_threads = True
    server.session = session
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # first-touch jit compiles happen behind process(); generous timeout
        s = socket.create_connection(("127.0.0.1", port), timeout=600)
        rf = s.makefile("rb")
        _send(s, {"cmd": "start"})
        assert _recv(rf)["ok"]

        # one synthetic frame over the wire (x,y,z,rgb f32 records)
        rng = np.random.default_rng(0)
        n = 500
        rec = np.zeros((n, 4), np.float32)
        rec[:, 0:2] = rng.uniform(-0.25, 0.25, (n, 2))
        rec[:, 2] = 0.1
        pose = np.eye(4)
        _send(s, {"cmd": "frame", "n": n,
                  "pose": pose.reshape(-1).tolist()})
        s.sendall(rec.tobytes())
        r = _recv(rf)
        assert r["ok"] and r["accepted"]

        _send(s, {"cmd": "metrics"})
        m = _recv(rf)["metrics"]
        assert m["frames_received"] == 1

        _send(s, {"cmd": "process", "variants": ["classified"]})
        r = _recv(rf)
        assert r["ok"]
        assert r["n_points"] >= 0
        assert "classified" in r["variants"]

        _send(s, {"cmd": "nonsense"})
        assert not _recv(rf)["ok"]

        _send(s, {"cmd": "shutdown"})
        assert _recv(rf)["ok"]
    finally:
        server.shutdown()
        session.close()


def test_serve_depth_wire(tmp_path):
    """The sensor-native depth wire over the TCP control plane: rays once,
    then u16 depth + rgb565 frames at 4 B/px (the production live format)."""
    from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep

    cfg = small_test_config(refine_every=1, z_clip=(0.05, 10.0))
    rays = camera_rays(64, 64, fx=80.0, fy=80.0)
    fr = make_depth_sweep(cfg, 1, width=64, height=64, srays=rays,
                          seed=5, noise_sd=1e-4, camera_height=0.4)[0]
    session = FusionSession(cfg, output_dir=str(tmp_path))
    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0),
                                             _ControlHandler)
    server.daemon_threads = True
    server.session = session
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=600)
        rf = s.makefile("rb")
        _send(s, {"cmd": "start"})
        assert _recv(rf)["ok"]

        n = rays.shape[1]
        # depth_frame before rays must be rejected, stream stays synced
        _send(s, {"cmd": "depth_frame", "n": n,
                  "pose": fr.pose.reshape(-1).tolist()})
        s.sendall(np.asarray(fr.depth_q, "<u2").tobytes()
                  + np.asarray(fr.rgb565, "<u2").tobytes())
        assert not _recv(rf)["ok"]

        _send(s, {"cmd": "rays", "n": n})
        s.sendall(np.asarray(rays, "<f4").tobytes())
        assert _recv(rf)["ok"]
        _send(s, {"cmd": "depth_frame", "n": n,
                  "pose": fr.pose.reshape(-1).tolist()})
        s.sendall(np.asarray(fr.depth_q, "<u2").tobytes()
                  + np.asarray(fr.rgb565, "<u2").tobytes())
        r = _recv(rf)
        assert r["ok"] and r["accepted"]

        _send(s, {"cmd": "process"})
        r = _recv(rf)
        assert r["ok"] and r["n_points"] > 0
        _send(s, {"cmd": "shutdown"})
        assert _recv(rf)["ok"]
    finally:
        server.shutdown()
        session.close()


def test_serve_short_reads_keep_stream_synced(tmp_path):
    """Binary frame payloads arriving in many small TCP segments must not
    desync the line protocol (VERDICT r1 #6: a single rfile.read(n) can
    return short mid-frame)."""
    import time

    cfg = small_test_config(refine_every=1)
    session = FusionSession(cfg, output_dir=str(tmp_path))
    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0),
                                             _ControlHandler)
    server.daemon_threads = True
    server.session = session
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=600)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        rf = s.makefile("rb")
        _send(s, {"cmd": "start"})
        assert _recv(rf)["ok"]

        n = 400
        rec = np.zeros((n, 4), np.float32)
        rec[:, 2] = 0.1
        blob = rec.tobytes()
        _send(s, {"cmd": "frame", "n": n,
                  "pose": np.eye(4).reshape(-1).tolist()})
        # drip the payload in small chunks with pauses so the server's
        # buffered reads are guaranteed to hit the short-read path
        for i in range(0, len(blob), 1000):
            s.sendall(blob[i:i + 1000])
            time.sleep(0.01)
        r = _recv(rf)
        assert r["ok"] and r["accepted"]

        # the NEXT line-oriented verb still parses -> stream stayed synced
        _send(s, {"cmd": "metrics"})
        m = _recv(rf)["metrics"]
        assert m["frames_received"] == 1
        _send(s, {"cmd": "shutdown"})
        assert _recv(rf)["ok"]
    finally:
        server.shutdown()
        session.close()
