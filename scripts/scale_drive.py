"""KITTI-class scale drive: the full System on a 1000+-frame synthetic
city-block circuit (300+ keyframes, 50k+ map points, loop closure at the
end of the lap).

The reference's operating envelope is exactly this regime
(Examples/Stereo/stereo_kitti.cc:29-166: thousands of frames, hundreds of
keyframes, 10^5 points); everything else in this repo validates on short
sequences. This driver produces the scale evidence: per-frame wall times,
per-stage timing growth vs map size, final ATE after loop closure, and a
distributed GBA run on the REAL resulting map.

Usage:
  JAX_PLATFORMS=cpu python scripts/scale_drive.py \
      [--frames=1600] [--points=40000] [--features=1500] \
      [--width=640] [--height=480] [--async] [--out=scale_drive.json]

Writes progress JSON lines to stderr-adjacent log (out + '.log') so a
running drive can be inspected, and the final summary to --out.
"""

import dataclasses
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the 850 m drive died once to a host
# XLA-CPU LLVM segfault under compile pressure (see PERF.md); caching
# compiled executables across (resumed) runs removes most of that
# pressure and makes resume restarts cheap.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu",
    )
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main(argv):
    flags = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            flags[k] = v
        else:
            flags[a] = True
    n_frames = int(flags.get("--frames", 1600))
    n_points = int(flags.get("--points", 40000))
    n_features = int(flags.get("--features", 1500))
    width = int(flags.get("--width", 640))
    height = int(flags.get("--height", 480))
    use_async = "--async" in flags
    stereo = "--stereo" in flags
    r0 = float(flags.get("--r0", 40.0))
    frac = float(flags.get("--frac", 1.18))
    max_depth = float(flags.get("--max-depth", 16.0))
    out_path = flags.get("--out", "scale_drive.json")
    ckpt_every = int(flags.get("--ckpt-every", 200))
    resume = "--resume" in flags
    if flags.get("--cpu", True):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from orb_slam2_commit_tpu.slam.system import System
    from orb_slam2_commit_tpu.slam.tracking import TrackingState
    from orb_slam2_commit_tpu.utils import synthetic
    from orb_slam2_commit_tpu.utils import trajectory as traj
    from orb_slam2_commit_tpu.utils.config import synthetic_config

    cfg = synthetic_config(
        width=width, height=height, n_features=n_features,
        sensor="stereo" if stereo else "monocular",
    )
    # Drive-scale keyframe policy: ~0.7 m spacing at ~9 m median depth,
    # corner rotations trigger via view angle.
    cfg = dataclasses.replace(
        cfg,
        tracker=dataclasses.replace(
            cfg.tracker,
            kf_baseline_depth_ratio=0.08,
            kf_view_angle_deg=8.0,
        ),
        system=dataclasses.replace(
            cfg.system, async_mapping=use_async
        ),
    )

    frames, poses_gt, scene = synthetic.drive_frames(
        cfg.camera, n_frames=n_frames, n_points=n_points, seed=7,
        r0=r0, frac=frac, max_depth=max_depth, stereo=stereo,
    )

    # ---- Checkpoint / resume ------------------------------------------
    # Long CPU drives have died to host XLA-CPU LLVM segfaults near the
    # end (PERF.md); periodic map+trajectory checkpoints let a relaunch
    # with --resume skip the completed prefix: the map is reloaded via
    # models/serialization (keyframes, points, covisibility, loop edges),
    # the trajectory entries are restored verbatim (they resolve against
    # the live map, so later loop corrections still apply to them), and
    # the tracker relocalizes into the loaded map on the next frame —
    # the same recovery path a kidnapped tracker uses.
    ckpt_map = out_path + ".ckpt.npz"
    ckpt_aux = out_path + ".ckpt.pkl"

    sys_ = System(cfg, async_mapping=use_async)
    frame_dt = np.zeros(n_frames)
    kf_count = np.zeros(n_frames, np.int32)
    pt_count = np.zeros(n_frames, np.int32)
    start_frame = 0
    prev_wall = 0.0
    render_s = 0.0
    if resume and os.path.exists(ckpt_map) and os.path.exists(ckpt_aux):
        with open(ckpt_aux, "rb") as f:
            aux = pickle.load(f)
        start_frame = aux["frame"] + 1
        sys_.load_map(ckpt_map)
        sys_.tracker.trajectory = aux["trajectory"]
        if sys_.loop_closer is not None:
            sys_.loop_closer.n_loops_closed = aux["n_loops_closed"]
        n_prev = min(start_frame, n_frames)
        frame_dt[:n_prev] = aux["frame_dt"][:n_prev]
        kf_count[:n_prev] = aux["kf_count"][:n_prev]
        pt_count[:n_prev] = aux["pt_count"][:n_prev]
        prev_wall = aux["track_wall_s"]
        render_s = aux["render_wall_s"]
        print(f"[resume] frame {start_frame}, "
              f"{sys_.map.n_keyframes()} KFs, "
              f"{int(sys_.map.pt_valid.sum())} points", flush=True)

    def write_ckpt(k):
        sys_.save_map(ckpt_map + ".tmp.npz")
        os.replace(ckpt_map + ".tmp.npz", ckpt_map)
        aux = {
            "frame": k,
            "trajectory": sys_.tracker.trajectory,
            "n_loops_closed": (sys_.loop_closer.n_loops_closed
                               if sys_.loop_closer else 0),
            "frame_dt": frame_dt[:k + 1],
            "kf_count": kf_count[:k + 1],
            "pt_count": pt_count[:k + 1],
            "track_wall_s": prev_wall + time.perf_counter() - t_start,
            "render_wall_s": render_s,
        }
        with open(ckpt_aux + ".tmp", "wb") as f:
            pickle.dump(aux, f)
        os.replace(ckpt_aux + ".tmp", ckpt_aux)

    log = open(out_path + ".log", "a" if start_frame else "w")
    t_start = time.perf_counter()
    t_r0 = time.perf_counter()
    for item in frames(start=start_frame):
        t_r1 = time.perf_counter()
        render_s += t_r1 - t_r0
        t0 = time.perf_counter()
        if stereo:
            k, left, right = item
            sys_.track_stereo(left, right, k / 30.0)
        else:
            k, img = item
            sys_.track_monocular(img, k / 30.0)
        t1 = time.perf_counter()
        frame_dt[k] = t1 - t0
        kf_count[k] = sys_.map.n_keyframes()
        pt_count[k] = int(sys_.map.pt_valid.sum())
        if (k + 1) % 100 == 0:
            # Incremental partial summary: long CPU runs have died to
            # host LLVM-compile segfaults near the end (see PERF.md) —
            # never lose the run's evidence to a late crash.
            partial = {
                "partial_at_frame": k + 1,
                "n_keyframes": int(kf_count[k]),
                "n_points": int(pt_count[k]),
                "n_loops_closed": (sys_.loop_closer.n_loops_closed
                                   if sys_.loop_closer else 0),
                "state": sys_.tracking_state().name,
                "stages": sys_.timings(),
            }
            with open(out_path + ".partial", "w") as f:
                json.dump(partial, f, indent=1)
            rec = {
                "frame": k + 1,
                "state": sys_.tracking_state().name,
                "kfs": int(kf_count[k]),
                "pts": int(pt_count[k]),
                "loops": (sys_.loop_closer.n_loops_closed
                          if sys_.loop_closer else 0),
                "dt_med_last100": float(np.median(frame_dt[k - 99:k + 1])),
                "dt_p95_last100": float(
                    np.percentile(frame_dt[k - 99:k + 1], 95)
                ),
                "elapsed_s": prev_wall + time.perf_counter() - t_start,
                "stages": {
                    n: {"count": v["count"], "mean_ms": v["mean_ms"],
                        "ema_ms": v["ema_ms"]}
                    for n, v in sys_.timings().items()
                },
            }
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(
                f"[{k+1:5d}] {rec['state']:5s} kfs={rec['kfs']:4d} "
                f"pts={rec['pts']:6d} loops={rec['loops']} "
                f"dt_med={rec['dt_med_last100']*1e3:7.1f}ms "
                f"p95={rec['dt_p95_last100']*1e3:7.1f}ms",
                flush=True,
            )
        if ckpt_every > 0 and (k + 1) % ckpt_every == 0:
            write_ckpt(k)
        t_r0 = time.perf_counter()

    track_wall = prev_wall + time.perf_counter() - t_start
    sys_.shutdown()

    # ---- Accuracy: scale-aligned ATE over tracked frames --------------
    est = np.atleast_2d(sys_.trajectory_positions())
    lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
    gt = np.asarray([-R.T @ t for R, t in poses_gt])
    if est.shape[0] >= 10 and est.shape[-1] == 3:
        offset = len(poses_gt) - len(est)
        ok = ~lost
        rmse = traj.ate_rmse(est[ok], gt[offset:][ok], align_scale=True)
    else:
        rmse = float("nan")
    # Span = total path length (the KITTI convention normalizes by
    # distance traveled, not endpoint distance — the circuit closes).
    path_len = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())

    # ---- Distributed GBA on the REAL final map ------------------------
    gba_wall = dist_gba_wall = -1.0
    n_kf_final = sys_.map.n_keyframes()
    n_pt_final = int(sys_.map.pt_valid.sum())
    try:
        os.environ["ORB_DISTRIBUTED_GBA"] = "1"
        t0 = time.perf_counter()
        sys_.loop_closer.run_global_ba(anchor_kf=0, n_iters=5)
        dist_gba_wall = time.perf_counter() - t0
        os.environ["ORB_DISTRIBUTED_GBA"] = "0"
        t0 = time.perf_counter()
        sys_.loop_closer.run_global_ba(anchor_kf=0, n_iters=5)
        gba_wall = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — record, don't lose the run
        log.write(json.dumps({"gba_error": repr(e)}) + "\n")

    summary = {
        "n_frames": n_frames,
        "image": [width, height],
        "n_features": n_features,
        "async": use_async,
        "final_state": sys_.tracking_state().name,
        "n_keyframes": n_kf_final,
        "n_points": n_pt_final,
        "n_loops_closed": (sys_.loop_closer.n_loops_closed
                           if sys_.loop_closer else 0),
        "corrections": list(getattr(
            sys_.loop_closer, "correction_stats", []
        ) if sys_.loop_closer else []),
        "lost_frames": int(lost.sum()),
        "ate_rmse": float(rmse),
        "path_len": path_len,
        "ate_pct_of_path": float(100.0 * rmse / path_len),
        "track_wall_s": track_wall,
        "render_wall_s": render_s,
        "frame_dt_med_ms": float(np.median(frame_dt) * 1e3),
        "frame_dt_p95_ms": float(np.percentile(frame_dt, 95) * 1e3),
        # Growth check: median frame time of each quarter of the run.
        "dt_med_by_quarter_ms": [
            float(np.median(frame_dt[i * n_frames // 4:
                                     (i + 1) * n_frames // 4]) * 1e3)
            for i in range(4)
        ],
        "gba_wall_s": gba_wall,
        "dist_gba_wall_s": dist_gba_wall,
        "stages": sys_.timings(),
        "worker_dropped": (sys_.mapping_worker.dropped
                           if sys_.mapping_worker else 0),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "stages"},
                     indent=1))
    log.close()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
