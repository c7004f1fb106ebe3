"""Live-driver transports: the ROS-node layer's wire + capture sources.

Covers the FrameSource implementations in examples/run_live.py — socket
stream (loopback), OpenCV video capture, directory watch — and the
queue-depth-1 drop policy of run_live itself (reference ROS nodes
subscribed with queue_size=1; reference README.md:190-248).
"""

import importlib.util
import os
import socket
import threading
import time

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run_live():
    spec = importlib.util.spec_from_file_location(
        "run_live", os.path.join(_HERE, "examples", "run_live.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rl():
    return _load_run_live()


def _test_frames(n=5, h=48, w=64, dtype=np.uint8):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        if dtype == np.uint8:
            im = rng.integers(0, 256, (h, w), dtype=np.uint8)
        else:
            im = rng.random((h, w), dtype=np.float32)
        out.append((0.1 * i, im))
    return out


class TestSocketSource:
    def test_loopback_roundtrip_uint8(self, rl):
        sent = _test_frames(6, dtype=np.uint8)
        a, b = socket.socketpair()
        pub = threading.Thread(
            target=lambda: (rl.publish_frames(a, sent), a.close())
        )
        pub.start()
        got = list(rl.SocketSource(sock=b).frames())
        pub.join(timeout=10)
        assert len(got) == len(sent)
        for (ts0, im0), (ts1, im1) in zip(sent, got):
            assert ts1 == pytest.approx(ts0)
            assert im1.dtype == np.uint8
            np.testing.assert_array_equal(im0, im1)

    def test_loopback_roundtrip_float32(self, rl):
        sent = _test_frames(3, dtype=np.float32)
        a, b = socket.socketpair()
        pub = threading.Thread(
            target=lambda: (rl.publish_frames(a, sent), a.close())
        )
        pub.start()
        got = list(rl.SocketSource(sock=b).frames())
        pub.join(timeout=10)
        assert len(got) == 3
        for (_, im0), (_, im1) in zip(sent, got):
            assert im1.dtype == np.float32
            np.testing.assert_array_equal(im0, im1)

    def test_tcp_listen_connect(self, rl):
        """Full TCP path: subscriber binds, publisher connects and streams."""
        sent = _test_frames(4)
        # Bind explicitly so the test can learn the ephemeral port.
        server = socket.create_server(("127.0.0.1", 0))
        port = server.getsockname()[1]

        got = []

        def subscribe():
            conn, _ = server.accept()
            got.extend(rl.SocketSource(sock=conn).frames())

        sub = threading.Thread(target=subscribe)
        sub.start()
        out = socket.create_connection(("127.0.0.1", port), timeout=10)
        rl.publish_frames(out, sent)
        out.close()
        sub.join(timeout=10)
        server.close()
        assert len(got) == 4
        np.testing.assert_array_equal(got[-1][1], sent[-1][1])

    def test_stereo_pair_roundtrip(self, rl):
        """Two-plane records: the synchronized left+right (or gray+depth)
        message of the reference's Stereo/RGBD ROS nodes."""
        rng = np.random.default_rng(3)
        sent = [
            (0.1 * i,
             rng.integers(0, 256, (32, 48), dtype=np.uint8),
             rng.random((32, 48), dtype=np.float32))
            for i in range(4)
        ]
        a, b = socket.socketpair()
        pub = threading.Thread(
            target=lambda: (rl.publish_frames(a, sent), a.close())
        )
        pub.start()
        got = list(rl.SocketSource(sock=b).frames())
        pub.join(timeout=10)
        assert len(got) == 4
        for (ts0, l0, r0), (ts1, l1, r1) in zip(sent, got):
            assert ts1 == pytest.approx(ts0)
            np.testing.assert_array_equal(l0, l1)
            np.testing.assert_array_equal(r0, r1)
            assert r1.dtype == np.float32

    def test_bad_magic_raises(self, rl):
        a, b = socket.socketpair()
        a.sendall(b"XXXX" + b"\x00" * (rl._FRAME_HDR.size - 4))
        a.close()
        with pytest.raises(ValueError):
            list(rl.SocketSource(sock=b).frames())


class TestOpenCVCaptureSource:
    def test_video_file(self, rl, tmp_path):
        cv2 = pytest.importorskip("cv2")
        path = str(tmp_path / "clip.avi")
        h, w, n = 64, 80, 8
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), 20.0, (w, h)
        )
        assert writer.isOpened()
        rng = np.random.default_rng(11)
        # Smooth gradient frames: MJPG is lossy, so assert on means.
        frames = []
        for i in range(n):
            gray = np.clip(
                np.linspace(0, 200, w)[None, :] + 5 * i
                + rng.normal(0, 2, (h, w)),
                0, 255,
            ).astype(np.uint8)
            frames.append(gray)
            writer.write(cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR))
        writer.release()

        got = list(rl.OpenCVCaptureSource(path, realtime=False).frames())
        assert len(got) == n
        for (ts, im), ref in zip(got, frames):
            assert im.shape == (h, w) and im.dtype == np.uint8
            assert abs(float(im.mean()) - float(ref.mean())) < 3.0
        # Timestamps follow container fps.
        assert got[1][0] == pytest.approx(1 / 20.0, abs=1e-6)

    def test_missing_capture_raises(self, rl):
        pytest.importorskip("cv2")
        with pytest.raises(RuntimeError):
            list(rl.OpenCVCaptureSource("/nonexistent.avi").frames())


class TestDirectoryWatch:
    def test_consumes_dropped_files(self, rl, tmp_path):
        cv2 = pytest.importorskip("cv2")
        ims = []
        for i in range(3):
            im = np.full((32, 40), 40 * i + 10, np.uint8)
            ims.append(im)
            cv2.imwrite(str(tmp_path / f"f{i:03d}.png"), im)
        src = rl.DirectoryWatchSource(str(tmp_path), idle_timeout_s=0.3)
        got = list(src.frames())
        assert len(got) == 3
        for (_, im), ref in zip(got, ims):
            np.testing.assert_allclose(
                np.asarray(im, np.float32).mean(), ref.mean(), atol=1.0
            )


class _FakeSystem:
    """Stands in for slam.system.System: records calls, simulates a slow
    tracker so the drop policy engages."""

    instance = None

    def __init__(self, config, vocabulary=None):
        self.tracked = []
        self.calls = []
        self.track_delay = 0.0
        _FakeSystem.instance = self

    def _rec(self, kind, ts):
        self.calls.append(kind)
        self.tracked.append(ts)
        if self.track_delay:
            time.sleep(self.track_delay)
        return np.eye(4)

    def track_monocular(self, image, ts):
        return self._rec("mono", ts)

    def track_stereo(self, left, right, ts):
        assert right is not None
        return self._rec("stereo", ts)

    def track_rgbd(self, image, depth, ts):
        assert depth is not None
        return self._rec("rgbd", ts)

    def shutdown(self):
        pass


class _SensorCfg:
    def __init__(self, sensor):
        self.sensor = sensor


class _ListSource:
    def __init__(self, items, pace_s=0.0):
        self.items = items
        self.pace_s = pace_s

    def frames(self):
        for item in self.items:
            if self.pace_s:
                time.sleep(self.pace_s)
            yield item


class TestDropPolicy:
    def test_slow_tracker_drops_stale_frames(self, rl, monkeypatch):
        monkeypatch.setattr(
            "orb_slam2_commit_tpu.slam.system.System", _FakeSystem
        )
        n = 20
        fps = 50.0
        items = [(i / fps, np.zeros((16, 16), np.uint8)) for i in range(n)]
        src = _ListSource(items, pace_s=0.0)

        # Wall clock runs ahead of stream timestamps once the fake tracker
        # burns 60 ms/frame against a 20 ms frame period.
        class SlowSystem(_FakeSystem):
            def __init__(self, config, vocabulary=None):
                super().__init__(config, vocabulary)
                self.track_delay = 0.06

        monkeypatch.setattr(
            "orb_slam2_commit_tpu.slam.system.System", SlowSystem
        )
        rl.run_live(src, config=None, vocab=None, fps=fps)
        sys_obj = _FakeSystem.instance
        assert 0 < len(sys_obj.tracked) < n
        # Tracked timestamps stay monotonic — drops skip, never reorder.
        assert all(
            b > a for a, b in zip(sys_obj.tracked, sys_obj.tracked[1:])
        )

    def test_fast_tracker_drops_nothing(self, rl, monkeypatch):
        monkeypatch.setattr(
            "orb_slam2_commit_tpu.slam.system.System", _FakeSystem
        )
        items = [(i / 30.0, np.zeros((16, 16), np.uint8)) for i in range(8)]
        rl.run_live(_ListSource(items), config=None, vocab=None, fps=30.0)
        assert len(_FakeSystem.instance.tracked) == 8
        assert _FakeSystem.instance.calls == ["mono"] * 8

    def test_sensor_dispatch(self, rl, monkeypatch):
        """Two-plane frames route to track_stereo / track_rgbd per the
        config's sensor — the Stereo/RGBD ROS node grabbers."""
        monkeypatch.setattr(
            "orb_slam2_commit_tpu.slam.system.System", _FakeSystem
        )
        im = np.zeros((16, 16), np.uint8)
        dep = np.ones((16, 16), np.float32)
        items = [(i / 30.0, im, dep) for i in range(4)]
        rl.run_live(
            _ListSource(items), config=_SensorCfg("stereo"), vocab=None
        )
        assert _FakeSystem.instance.calls == ["stereo"] * 4
        rl.run_live(
            _ListSource(items), config=_SensorCfg("rgbd"), vocab=None
        )
        assert _FakeSystem.instance.calls == ["rgbd"] * 4
