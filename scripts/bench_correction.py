"""Attribute loop-correction wall time at map scale.

The r05 850 m drive measured 88.9 s for the full correction at 965 KFs
(`scale_drive_r5_850m.json` correction_stats). This tool loads a REAL
drive map (a checkpoint npz) and times the correction pipeline's phases
in isolation on it — essential-graph edge assembly, measurement build,
Sim3 pose-graph solve (cold = compile + run, warm = run), the
whole-map point-correction sweep, and the synchronous global BA — so
optimization targets the measured whale, not a guess.

Usage:
  JAX_PLATFORMS=cpu python scripts/bench_correction.py <map.npz> [--gba]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu",
    )
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main(argv):
    path = argv[0]
    do_gba = "--gba" in argv
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orb_slam2_commit_tpu.models.serialization import load_map
    from orb_slam2_commit_tpu.optim import pose_graph
    from orb_slam2_commit_tpu.slam import loop_closing as lc_mod
    from orb_slam2_commit_tpu.slam.loop_closing import LoopCloser as LoopClosing
    from orb_slam2_commit_tpu.utils.config import synthetic_config

    m = load_map(path)
    valid_kfs = np.where(m.kf_valid)[0]
    K = valid_kfs.size
    P = int(m.pt_valid.sum())
    print(f"map: {K} keyframes, {P} points")
    cfg = synthetic_config(
        width=640, height=480, n_features=1500, sensor="stereo"
    )
    lc = LoopClosing(cfg, m, None)  # db unused by the timed phases

    # A fabricated closure between the newest KF and an early one — the
    # timing of assembly/solve/sweep depends only on map structure, not
    # on the particular Sim3.
    kf = int(valid_kfs[-1])
    loop_kf = int(valid_kfs[0])
    corrected_set = {kf}
    poses_R_old = m.kf_pose_R.copy()
    poses_t_old = m.kf_pose_t.copy()

    # ---- Phase 1: edge assembly (the per-KF covisibility loop) -------
    t0 = time.perf_counter()
    remap = np.full(m.cfg.max_keyframes, -1, np.int64)
    remap[valid_kfs] = np.arange(valid_kfs.size)
    ei, ej, raw_pairs = [], [], []
    seen = set()

    def add_edge(a, b):
        a, b = int(a), int(b)
        if a == b or (min(a, b), max(a, b)) in seen:
            return
        if remap[a] < 0 or remap[b] < 0:
            return
        seen.add((min(a, b), max(a, b)))
        ei.append(int(remap[a]))
        ej.append(int(remap[b]))
        raw_pairs.append((a, b))

    for k in valid_kfs:
        parent = m.kf_parent[k]
        if parent >= 0 and m.kf_valid[parent]:
            add_edge(k, parent)
        for c in m.covisible_keyframes(int(k), None, min_weight=100):
            add_edge(k, c)
    for (a, b) in (m.loop_edges or []):
        add_edge(a, b)
    add_edge(kf, loop_kf)
    t_assembly = time.perf_counter() - t0
    E = len(ei)
    print(f"edge assembly: {t_assembly:.2f} s ({E} edges)")

    # ---- Phase 2: measurement build ----------------------------------
    t0 = time.perf_counter()
    ms, mR, mt = [], [], []
    for (a, b) in raw_pairs:
        both = a in corrected_set and b in corrected_set
        if both or {a, b} == {kf, loop_kf}:
            Ra, ta = m.kf_pose_R[a], m.kf_pose_t[a]
            Rb, tb = m.kf_pose_R[b], m.kf_pose_t[b]
        else:
            Ra, ta = poses_R_old[a], poses_t_old[a]
            Rb, tb = poses_R_old[b], poses_t_old[b]
        Rab = Ra @ Rb.T
        tab = ta - Rab @ tb
        ms.append(1.0)
        mR.append(Rab)
        mt.append(tab)
    t_meas = time.perf_counter() - t0
    print(f"measurement build: {t_meas:.2f} s")

    # ---- Phase 3: Sim3 graph solve (cold vs warm) --------------------
    fixed = np.zeros(K, bool)
    fixed[remap[loop_kf]] = True
    vert_R = m.kf_pose_R[valid_kfs].copy()
    vert_t = m.kf_pose_t[valid_kfs].copy()
    if "--perturb" in argv:
        # Drift-like ramp: vertex k rotated/translated proportionally to
        # its index (up to ~2 deg / 2 m at the newest end) while the
        # measurements stay at the un-perturbed relative poses — the
        # solve then has genuine loop-sized error to distribute, like a
        # real pre-correction graph.
        rng = np.random.default_rng(0)
        ramp = np.arange(K) / max(K - 1, 1)
        for kk in range(K):
            if fixed[kk]:
                continue
            w = rng.normal(0, 1, 3)
            w = w / np.linalg.norm(w) * np.deg2rad(2.0) * ramp[kk]
            wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                           [-w[1], w[0], 0]])
            th = np.linalg.norm(w)
            if th > 1e-12:
                dR = (np.eye(3) + np.sin(th) / th * wx
                      + (1 - np.cos(th)) / th**2 * (wx @ wx))
            else:
                dR = np.eye(3)
            vert_R[kk] = dR @ vert_R[kk]
            vert_t[kk] = vert_t[kk] + rng.normal(0, 0.7, 3) * ramp[kk]
    graph = pose_graph.Sim3Graph(
        s=jnp.ones(K), R=jnp.asarray(vert_R),
        t=jnp.asarray(vert_t),
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        meas_s=jnp.asarray(ms), meas_R=jnp.asarray(np.stack(mR)),
        meas_t=jnp.asarray(np.stack(mt)),
        edge_valid=jnp.ones(E, bool),
    )
    results = {}
    for solver in ("pcg", "dense") if "--compare" in argv else ("auto",):
        t0 = time.perf_counter()
        out = pose_graph.optimize_sim3_graph_jit(
            graph, n_iters=20, fix_scale=True, solver=solver)
        jax.block_until_ready(out.t)
        t_solve_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = pose_graph.optimize_sim3_graph_jit(
            graph, n_iters=20, fix_scale=True, solver=solver)
        jax.block_until_ready(out.t)
        t_solve_warm = time.perf_counter() - t0
        results[solver] = out
        print(f"sim3 graph solve[{solver}]: cold {t_solve_cold:.2f} s, "
              f"warm {t_solve_warm:.2f} s (K={K}, E={E})")
    if "--compare" in argv:
        ca = np.asarray(-np.einsum('kab,kb->ka', np.asarray(results['pcg'].R).transpose(0,2,1), np.asarray(results['pcg'].t)))
        cb = np.asarray(-np.einsum('kab,kb->ka', np.asarray(results['dense'].R).transpose(0,2,1), np.asarray(results['dense'].t)))
        d = np.linalg.norm(ca - cb, axis=1)
        print(f"pcg-vs-dense camera-center diff: max {d.max():.4f} m, median {np.median(d):.4f} m")

    # ---- Phase 4: whole-map point sweep + SE3-ify --------------------
    s_out = np.asarray(out.s)
    R_out = np.asarray(out.R)
    t_out = np.asarray(out.t)
    pt_pos = m.pt_pos.copy()
    t0 = time.perf_counter()
    done_mask = np.zeros(m.cfg.max_points, bool)
    for local, k in enumerate(valid_kfs):
        R_old, t_old = m.kf_pose_R[k], m.kf_pose_t[k]
        pids = m.kf_point_idx[k]
        pids = np.unique(pids[pids >= 0])
        if pids.size:
            pids = pids[m.pt_valid[pids] & ~done_mask[pids]]
        if pids.size:
            pw = pt_pos[pids]
            p_cam = pw @ R_old.T + t_old
            pt_pos[pids] = ((p_cam - t_out[local]) @ R_out[local]) / s_out[local]
            done_mask[pids] = True
    t_sweep = time.perf_counter() - t0
    print(f"point sweep: {t_sweep:.2f} s")

    total = t_assembly + t_meas + t_solve_cold + t_sweep
    print(f"essential-graph total (cold): {total:.2f} s")

    if do_gba:
        t0 = time.perf_counter()
        lc.run_global_ba(anchor_kf=loop_kf, n_iters=10)
        t_gba = time.perf_counter() - t0
        print(f"synchronous global BA: {t_gba:.2f} s")


if __name__ == "__main__":
    main(sys.argv[1:])
