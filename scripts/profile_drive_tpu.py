"""Mapping-mode on-device System evidence (VERDICT r04 missing #3).

Runs a stereo CITY-DRIVE segment through the full System on the TPU in
FULL MAPPING MODE (keyframes, triangulation, local BA, loop thread all
live), captures a jax.profiler trace over the steady segment, then
re-traces the same frames in localization mode. One artifact reports:

  * mapping-mode device busy ms/frame (tracking + amortized mapping),
  * localization-mode device busy ms/frame (tracking alone),
  * their difference = the mapper's amortized on-device cost,
  * keyframe cadence + host stage walls for attribution.

The reference's real-time claim covers the whole system
(reference README.md:80, per-sequence timing in
Examples/Monocular/mono_tum.cc:119-127); this is the measured
co-located counterpart (device-busy excludes the development tunnel's
transfer latency, which co-located hardware does not pay).

Usage (axon TPU; ~0.5 GB trace under traces/, gitignored):
  PYTHONPATH=/root/.axon_site:/root/repo \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0 \
  python scripts/profile_drive_tpu.py [--warm=60] [--trace=100]

Writes PROFILE_DRIVE_TPU.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from profile_system_tpu import parse_xplane  # noqa: E402


def device_busy(planes, n):
    out = {}
    for k, v in planes.items():
        if "TPU" in k.upper() or "device" in k.lower():
            out[k] = {
                "busy_ms": v["busy_ms"],
                "busy_ms_per_frame": v["busy_ms"] / n,
                "top_ops_ms": v.get("top_ops_ms", v.get("top")),
            }
    return out


def main(argv):
    flags = dict((a.split("=")[0], (a.split("=") + ["1"])[1]) for a in argv)
    n_warm = int(flags.get("--warm", 60))
    n_trace = int(flags.get("--trace", 100))
    n_feat = int(flags.get("--features", 1500))

    import dataclasses

    import jax

    from orb_slam2_commit_tpu.slam.system import System
    from orb_slam2_commit_tpu.utils import synthetic
    from orb_slam2_commit_tpu.utils.config import synthetic_config

    platform = jax.devices()[0].platform
    print("platform:", platform, jax.devices(), flush=True)

    # The scale drive's config and geometry (scripts/scale_drive.py), a
    # short segment of the same circuit.
    cfg = synthetic_config(
        width=640, height=480, n_features=n_feat, sensor="stereo"
    )
    cfg = dataclasses.replace(
        cfg,
        tracker=dataclasses.replace(
            cfg.tracker, kf_baseline_depth_ratio=0.08, kf_view_angle_deg=8.0
        ),
    )
    n_total = n_warm + n_trace
    frames, poses_gt, scene = synthetic.drive_frames(
        cfg.camera, n_frames=max(600, n_total), n_points=40000, seed=7,
        r0=40.0, max_depth=12.0, stereo=True,
    )
    print("pre-rendering", n_total, "stereo pairs...", flush=True)
    pre = []
    for k, left, right in frames():
        pre.append((
            np.clip(np.round(left), 0, 255).astype(np.uint8),
            np.clip(np.round(right), 0, 255).astype(np.uint8),
        ))
        if len(pre) >= n_total:
            break

    sys_ = System(cfg)
    if sys_.vocabulary is not None:
        jax.block_until_ready(sys_.vocabulary.device_arrays())

    # Warm phase: drives the map up and compiles every mapping-mode
    # executable (sync mapping -> compiles happen inline).
    for i in range(n_warm):
        sys_.track_stereo(pre[i][0], pre[i][1], i / 30.0)
    print("warm done:", sys_.tracking_state().name,
          "kfs", sys_.map.n_keyframes(), flush=True)
    kfs_before = sys_.map.n_keyframes()

    trace_dir = "traces/drive_tpu"
    os.makedirs(trace_dir, exist_ok=True)
    summary = {"platform": platform, "n_warm": n_warm,
               "n_trace": n_trace, "n_features": n_feat}

    # --- Trace 1: FULL MAPPING MODE over the steady drive segment -----
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for n in range(n_trace):
        i = n_warm + n
        sys_.track_stereo(pre[i][0], pre[i][1], i / 30.0)
    jax.profiler.stop_trace()
    wall_map = time.perf_counter() - t0
    kfs_traced = sys_.map.n_keyframes() - kfs_before
    planes_map = parse_xplane(trace_dir)
    summary["mapping_mode"] = {
        "wall_s": wall_map,
        "wall_ms_per_frame": wall_map * 1e3 / n_trace,
        "keyframes_in_trace": int(kfs_traced),
        "kf_cadence_frames": (n_trace / max(kfs_traced, 1)),
        "final_state": sys_.tracking_state().name,
        "n_keyframes": int(sys_.map.n_keyframes()),
        "n_points": int(sys_.map.pt_valid.sum()),
        "device": device_busy(planes_map, n_trace),
    }
    print(json.dumps(summary["mapping_mode"], default=str)[:600], flush=True)

    # --- Trace 2: localization-mode replay of the SAME frames ---------
    # (tracking-only device cost on the same map for the subtraction).
    # Ping-pong from the MOST RECENT frame backward so the motion model
    # stays consistent — a forward re-sweep from n_warm would jump the
    # pose and pollute the trace with relocalizations (measured: 7.4
    # ms/frame of EPnP in the first cut of this script).
    sys_.activate_localization_mode()
    order = (list(range(n_total - 1, n_warm, -1))
             + list(range(n_warm + 1, n_total)))
    replay = (order * ((n_trace // len(order)) + 1))[:n_trace]
    for n, j in enumerate(replay[:6]):   # warm localization executables
        sys_.track_stereo(pre[j][0], pre[j][1], 300.0 + n / 30.0)
    lost_before = sum(e.lost for e in sys_.tracker.trajectory)
    trace_dir2 = "traces/drive_tpu_loc"
    os.makedirs(trace_dir2, exist_ok=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir2)
    for n, j in enumerate(replay):
        sys_.track_stereo(pre[j][0], pre[j][1], 400.0 + n / 30.0)
    jax.profiler.stop_trace()
    wall_loc = time.perf_counter() - t0
    planes_loc = parse_xplane(trace_dir2)
    summary["localization_mode"] = {
        "wall_s": wall_loc,
        "wall_ms_per_frame": wall_loc * 1e3 / n_trace,
        "final_state": sys_.tracking_state().name,
        "lost_frames_in_trace": int(
            sum(e.lost for e in sys_.tracker.trajectory) - lost_before
        ),
        "device": device_busy(planes_loc, n_trace),
    }

    def total_busy(block):
        return sum(v["busy_ms_per_frame"] for v in block["device"].values())

    # Attribute tracking vs mapping INSIDE the mapping-mode trace by op
    # name: the production tracking path is the fused frontend +
    # local-map track + pose refinement; everything else on the device
    # during mapping mode is the mapper (triangulation, fuse, local BA)
    # + loop stack. (The localization-mode trace deliberately runs the
    # STAGED tracking route — temporal-VO/mbVO semantics — so a
    # mapping-minus-localization subtraction would compare different
    # tracking implementations; it is reported as secondary evidence.)
    TRACK_OPS = ("motion_track", "local_map_track", "pose_optimization")
    track_busy = 0.0
    for v in summary["mapping_mode"]["device"].values():
        for op, ms in v["top_ops_ms"]:
            if any(t in op for t in TRACK_OPS):
                track_busy += ms / n_trace
    map_busy = total_busy(summary["mapping_mode"])
    loc_busy = total_busy(summary["localization_mode"])
    kf_cadence = summary["mapping_mode"]["kf_cadence_frames"]
    summary["derived"] = {
        "mapping_mode_busy_ms_per_frame": map_busy,
        "tracking_busy_ms_per_frame_in_mapping_trace": track_busy,
        "mapper_and_loop_busy_ms_per_frame": map_busy - track_busy,
        "mapper_and_loop_busy_ms_per_keyframe":
            (map_busy - track_busy) * kf_cadence,
        "staged_localization_replay_busy_ms_per_frame": loc_busy,
        "note": (
            "device busy = serial no-overlap bound; tracking attributed "
            "by op name inside the mapping-mode trace (fused frontend + "
            "local-map track + pose opt); mapping runs on the async "
            "worker off the tracking critical path in production (P2), "
            "and this segment's keyframe cadence (1 per "
            f"{kf_cadence:.1f} frames) is far denser than steady-state "
            "drives (1 per ~4-10 frames)"
        ),
    }
    summary["stage_wall"] = {
        n: {"count": v["count"], "mean_ms": v["mean_ms"]}
        for n, v in sys_.timings().items()
    }
    sys_.shutdown()
    with open("PROFILE_DRIVE_TPU.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["derived"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
