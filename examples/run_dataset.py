"""Dataset CLI driver — the Examples/ layer of the reference (L8).

Replaces Examples/{Monocular,Stereo,RGB-D}/*.cc: load a sequence, feed
frames through the System, print per-frame timing stats, export
trajectories.

Usage:
  python examples/run_dataset.py tum-mono <seq_dir> <settings.yaml> [out_prefix]
  python examples/run_dataset.py tum-rgbd <seq_dir> <assoc.txt> <settings.yaml> [out_prefix]
  python examples/run_dataset.py kitti-mono <seq_dir> <settings.yaml> [out_prefix]
  python examples/run_dataset.py kitti-stereo <seq_dir> <settings.yaml> [out_prefix]
  python examples/run_dataset.py euroc-mono <seq_dir> <settings.yaml> [out_prefix]

Out of the box this runs the reference architecture (src/System.cc:95-107):
async local mapping + loop closing with the bundled vocabulary. Flags:
  --sync             synchronous deterministic pipeline (mapping inline)
  --no-vocab         disable place recognition + loop closing
  --vocab=<path>     use a specific vocabulary (.npz or ORBvoc.txt layout)
  --localization     pure localization mode against --map=<map.npz>
"""

import sys
import time

import numpy as np


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    flags = {a.split("=")[0]: (a.split("=") + [True])[1]
             for a in argv if a.startswith("--")}
    if not args:
        print(__doc__)
        return 1
    # Deferred so `run_dataset.py` with no/bad args prints usage without
    # initializing a device backend.
    from orb_slam2_commit_tpu.slam.system import System
    from orb_slam2_commit_tpu.utils import datasets, settings

    mode = args[0]

    if mode == "tum-rgbd":
        seq_dir, assoc, yaml = args[1], args[2], args[3]
        out = args[4] if len(args) > 4 else "trajectory"
        seq = datasets.load_tum_rgbd(seq_dir, assoc)
        cfg = settings.config_from_settings(yaml, sensor="rgbd")
    elif mode == "tum-mono":
        seq_dir, yaml = args[1], args[2]
        out = args[3] if len(args) > 3 else "trajectory"
        seq = datasets.load_tum_mono(seq_dir)
        cfg = settings.config_from_settings(yaml, sensor="monocular")
    elif mode == "kitti-mono":
        seq_dir, yaml = args[1], args[2]
        out = args[3] if len(args) > 3 else "trajectory"
        seq = datasets.load_kitti(seq_dir, stereo=False)
        cfg = settings.config_from_settings(
            yaml, sensor="monocular", width=1241, height=376
        )
    elif mode == "kitti-stereo":
        seq_dir, yaml = args[1], args[2]
        out = args[3] if len(args) > 3 else "trajectory"
        seq = datasets.load_kitti(seq_dir, stereo=True)
        cfg = settings.config_from_settings(
            yaml, sensor="stereo", width=1241, height=376
        )
    elif mode == "euroc-mono":
        seq_dir, yaml = args[1], args[2]
        out = args[3] if len(args) > 3 else "trajectory"
        seq = datasets.load_euroc(seq_dir)
        cfg = settings.config_from_settings(
            yaml, sensor="monocular", width=752, height=480
        )
    elif mode == "euroc-stereo":
        # Online rectification from the settings' LEFT.*/RIGHT.* blocks
        # (oracle: stereo_euroc.cc:55-98).
        seq_dir, yaml = args[1], args[2]
        out = args[3] if len(args) > 3 else "trajectory"
        seq = datasets.load_euroc(seq_dir, stereo=True)
        cfg = settings.config_from_settings(
            yaml, sensor="stereo", width=752, height=480
        )
        s = settings.parse_opencv_yaml(yaml)
        w, h = cfg.camera.width, cfg.camera.height
        maps_l = datasets.rectify_maps(
            s["LEFT.K"], s["LEFT.D"].reshape(-1), s["LEFT.R"],
            s["LEFT.P"][:3, :3], w, h,
        )
        maps_r = datasets.rectify_maps(
            s["RIGHT.K"], s["RIGHT.D"].reshape(-1), s["RIGHT.R"],
            s["RIGHT.P"][:3, :3], w, h,
        )
    else:
        print(__doc__)
        return 1

    vocab = flags.get("--vocab", "default")
    if flags.get("--no-vocab"):
        vocab = None
    sys_ = System(
        cfg, vocabulary=vocab,
        async_mapping=False if flags.get("--sync") else True,
    )
    if flags.get("--map"):
        sys_.load_map(flags["--map"])
    if flags.get("--localization"):
        sys_.activate_localization_mode()

    rectify = mode == "euroc-stereo"
    times = []
    for i, (ts, img, aux) in enumerate(seq.frames()):
        t0 = time.perf_counter()
        if rectify:
            img = datasets.remap_bilinear(img, *maps_l)
            aux = datasets.remap_bilinear(aux, *maps_r)
        if cfg.sensor == "rgbd":
            sys_.track_rgbd(img, aux, ts)
        elif cfg.sensor == "stereo":
            sys_.track_stereo(img, aux, ts)
        else:
            sys_.track_monocular(img, ts)
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            print(
                f"frame {i}/{len(seq)} state={sys_.tracking_state().name} "
                f"kf={sys_.map.n_keyframes()} pts={sys_.map.n_points()} "
                f"dt={times[-1]*1e3:.1f}ms"
            )

    sys_.shutdown()
    # Timing stats like the reference drivers (mono_tum.cc:119-127).
    ts_sorted = np.sort(times)
    print(f"median tracking time: {ts_sorted[len(ts_sorted)//2]*1e3:.2f} ms")
    print(f"mean tracking time:   {np.mean(times)*1e3:.2f} ms")
    sys_.save_trajectory_tum(out + "_tum.txt")
    sys_.save_keyframe_trajectory_tum(out + "_kf_tum.txt")
    sys_.save_trajectory_kitti(out + "_kitti.txt")
    print(f"trajectories saved with prefix {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
