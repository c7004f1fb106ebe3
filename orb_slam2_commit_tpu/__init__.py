"""orb_slam2_commit_tpu — a TPU-native visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of ORB-SLAM2
(reference: qpc001/ORB_SLAM2_Commit, an annotated fork of raulmur/ORB_SLAM2):

- FAST + oriented-BRIEF feature extraction over an 8-level image pyramid
  (reference: src/ORBextractor.cc) — here: batched XLA/Pallas kernels with
  static shapes and validity masks.
- Hamming-distance descriptor matching with rotation-consistency histograms
  (reference: src/ORBmatcher.cc) — here: dense masked XOR+popcount / MXU
  ±1-matmul distance matrices.
- Two-view initialization, EPnP relocalization, Horn Sim3 loop alignment
  (reference: src/Initializer.cc, src/PnPsolver.cc, src/Sim3Solver.cc) —
  here: vmapped batched RANSAC.
- Bundle adjustment (pose-only / local / global) and pose-graph optimization
  (reference: src/Optimizer.cc + Thirdparty/g2o) — here: batched
  Gauss-Newton/LM with Schur complement marginalization of point blocks,
  shardable over a jax.sharding.Mesh with psum reductions.
- Array-of-struct map state (keyframes, points, observations, covisibility)
  instead of the reference's mutex-guarded pointer graph
  (reference: src/Map.cc, src/KeyFrame.cc, src/MapPoint.cc).

Design stance: not a port. All numeric stages are pure, jittable functions
over fixed-shape arrays; dynamic counts are handled with padding + masks.
"""

__version__ = "0.1.0"

from orb_slam2_commit_tpu.utils.config import (  # noqa: F401
    CameraConfig,
    ORBConfig,
    SLAMConfig,
    TrackerConfig,
)
