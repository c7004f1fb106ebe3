"""Multi-loop validation (opt-in: ORB_RUN_SCALE=1).

The reference accumulates loop edges across closures
(src/KeyFrame.cc:532-543) and every later essential graph consumes all
of them (src/Optimizer.cc:966-987); KITTI 00 closes several loops per
sequence. The figure-eight drive returns to its crossing after every
lobe, closing >= 2 loops in one run — the second on an
already-corrected map — and ends with a kidnap relocalization probe
against the final multi-loop map.

The always-on tests cover the figure-eight generator; the full drive is
opt-in (~1 h on a 2-core host):

  ORB_RUN_SCALE=1 python -m pytest tests/test_multiloop.py -q -k full
"""

import os

import numpy as np
import pytest

from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


class TestFigure8Generator:
    def test_returns_to_crossing_each_lobe(self):
        for s in (0.0, 2.0 * np.pi, 4.0 * np.pi):
            c = synthetic.figure8_path(np.array([s]), 25.0)[0]
            assert np.linalg.norm(c) < 1e-6, (s, c)

    def test_lobes_are_distinct(self):
        a = synthetic.figure8_path(np.array([0.5 * np.pi]), 25.0)[0]
        b = synthetic.figure8_path(np.array([2.5 * np.pi]), 25.0)[0]
        assert a[0] > 1.0 and b[0] < -1.0  # opposite half-planes

    def test_trajectory_smooth(self):
        poses = synthetic.figure8_trajectory(800, r=25.0, laps=2.15)
        c = np.array([-R.T @ t for R, t in poses])
        step = np.linalg.norm(np.diff(c, axis=0), axis=1)
        assert step.max() < 1.5 * step.min()  # near-constant speed
        fw = np.gradient(c, axis=0)
        yaw = np.unwrap(np.arctan2(fw[:, 0], fw[:, 2]))
        assert np.abs(np.diff(yaw)).max() < np.deg2rad(2.0)

    def test_scene_lines_both_lobes(self):
        rng = np.random.default_rng(0)
        sc = synthetic.figure8_scene(rng, n_points=8000, r=25.0)
        assert sc.points.shape == (8000, 3)
        # Landmarks on both sides of the plane x=0 (both lobes).
        assert (sc.points[:, 0] > 5).sum() > 2000
        assert (sc.points[:, 0] < -5).sum() > 2000


@pytest.mark.skipif(
    os.environ.get("ORB_RUN_SCALE") != "1",
    reason="full figure-eight drive takes ~1 h; set ORB_RUN_SCALE=1",
)
class TestFullFigure8:
    def test_full_multiloop_drive(self, tmp_path):
        import json
        import subprocess
        import sys as _sys

        out = tmp_path / "multiloop.json"
        rc = subprocess.call([
            _sys.executable,
            os.path.join(os.path.dirname(__file__), os.pardir,
                         "scripts", "multiloop_drive.py"),
            "--frames=1400", "--points=120000", "--features=1500",
            "--stereo", f"--out={out}",
        ], env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert rc == 0
        d = json.loads(out.read_text())
        assert d["final_state"] == "OK"
        assert d["n_loops_closed"] >= 2, d["n_loops_closed"]
        # Loop edges accumulate; the second closure's essential graph
        # saw the first closure's edge (loop_events[i] snapshots the
        # edge list at closure time).
        assert len(d["loop_edges_final"]) >= 2
        assert len(d["loop_events"][-1]["loop_edges"]) >= 2
        assert d["ate_pct_of_path"] < 1.5, d["ate_pct_of_path"]
        assert d["kidnap_reloc"]["relocalized"], d["kidnap_reloc"]
