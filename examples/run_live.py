"""Live-stream driver — the ROS-node layer of the reference, re-imagined.

The reference shipped ROS nodes (Mono / Stereo / RGBD) that subscribe to
image topics and feed System::Track* per message (reference:
README.md:190-248, build_ros.sh; the nodes' sources are absent from the
snapshot). This driver provides the same capability without ROS: a
FrameSource abstraction that any transport (V4L2 camera, socket, message
queue) can implement, pumped into the System facade online with drop
policy for real-time operation.

Usage:
  # Simulated live source (synthetic renderer, runs anywhere):
  PYTHONPATH=. python examples/run_live.py --sim --frames 30

  # Directory watch: consume new image files as they appear (the
  # file-drop equivalent of an image topic):
  PYTHONPATH=. python examples/run_live.py --watch <dir> --settings <yaml>
"""

import os
import sys
import time

import numpy as np


class FrameSource:
    """Interface: iterate (timestamp, gray_image float32[H, W]) pairs."""

    def frames(self):
        raise NotImplementedError


class SyntheticSource(FrameSource):
    """Renders the synthetic ground-truth sequence at a fixed fps."""

    def __init__(self, config, n_frames=30, fps=30.0):
        from orb_slam2_commit_tpu.utils import synthetic

        self.images, self.poses, self.scene = synthetic.render_sequence(
            config.camera, n_frames=n_frames, n_points=400, seed=3, step=0.05
        )
        self.fps = fps

    def frames(self):
        t0 = time.time()
        for i, im in enumerate(self.images):
            target = t0 + i / self.fps
            now = time.time()
            if target > now:
                time.sleep(target - now)
            yield time.time() - t0, np.asarray(im, np.float32)


class DirectoryWatchSource(FrameSource):
    """Consumes image files appearing in a directory, sorted by name —
    the file-drop equivalent of subscribing to an image topic."""

    def __init__(self, path, poll_s=0.05, idle_timeout_s=5.0):
        self.path = path
        self.poll_s = poll_s
        self.idle_timeout_s = idle_timeout_s

    def frames(self):
        from orb_slam2_commit_tpu.utils.datasets import _load_gray

        seen = set()
        idle = 0.0
        while idle < self.idle_timeout_s:
            names = sorted(
                f for f in os.listdir(self.path)
                if f.lower().endswith((".png", ".jpg", ".pgm")) and f not in seen
            )
            if not names:
                time.sleep(self.poll_s)
                idle += self.poll_s
                continue
            idle = 0.0
            for f in names:
                seen.add(f)
                yield time.time(), _load_gray(os.path.join(self.path, f))


def run_live(source, config, vocab="default", drop_when_behind=True,
             fps=30.0, viewer_dir=None, use_viewer=False):
    """Pump a FrameSource through the System online.

    drop_when_behind mirrors a ROS subscriber queue of depth 1: when
    tracking falls behind the stream, stale frames (older than 1.5 frame
    periods by arrival time) are skipped so the tracker always sees the
    freshest image. Newer-than-stale frames are still tracked, because
    skipping them would break the constant-velocity motion model.

    use_viewer starts the live render thread (slam/viewer.ViewerLoop —
    the reference's Viewer thread, src/Viewer.cc:55-243); viewer_dir
    additionally streams rendered frames as PNGs into that directory.
    """
    from orb_slam2_commit_tpu.slam.system import System

    system = System(config, vocabulary=vocab)
    viewer = None
    if use_viewer or viewer_dir is not None:
        from orb_slam2_commit_tpu.slam.viewer import ViewerLoop

        viewer = ViewerLoop(
            system, fps=fps, stream_dir=viewer_dir
        ).start()
    n_in = n_tracked = n_dropped = 0
    stale_s = 1.5 / fps
    t_start = time.time()

    for ts, image in source.frames():
        n_in += 1
        age = (time.time() - t_start) - ts
        if drop_when_behind and age > stale_s and n_in > 2:
            n_dropped += 1
            continue
        pose = system.track_monocular(image, ts)
        if viewer is not None:
            viewer.update(system.tracker.last_frame, image)
        if pose is not None:
            n_tracked += 1
    if viewer is not None:
        viewer.join(timeout=5.0)
        print(f"viewer: {viewer.n_rendered} renders")
    system.shutdown()
    print(
        f"stream done: {n_in} frames in, {n_tracked} tracked, "
        f"{n_dropped} dropped"
    )
    return system


def main(argv):
    flags = {a.split("=")[0]: (a.split("=") + [True])[1] for a in argv}
    use_viewer = "--viewer" in flags
    viewer_dir = flags.get("--viewer-dir")
    if "--sim" in flags:
        from orb_slam2_commit_tpu.utils.config import synthetic_config

        n = int(flags.get("--frames", 30))
        config = synthetic_config(width=400, height=300, n_features=1000)
        src = SyntheticSource(config, n_frames=n)
        run_live(src, config, use_viewer=use_viewer, viewer_dir=viewer_dir)
    elif "--watch" in flags:
        from orb_slam2_commit_tpu.utils import settings

        config = settings.config_from_settings(
            flags["--settings"], sensor="monocular"
        )
        src = DirectoryWatchSource(flags["--watch"])
        run_live(src, config, use_viewer=use_viewer, viewer_dir=viewer_dir)
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
