"""Compact a drive checkpoint map into a small shippable snapshot.

Drive checkpoints (scripts/scale_drive.py) save the map at full padded
capacity (512 KFs x 131072 points — ~100 MB raw). For the multichip
dryrun we ship a REAL mid-drive map (genuine covisibility structure,
VERDICT r04 weak #5), so this tool: trims keyframe arrays to next_kf,
remaps the sparse point-id space (culling leaves gaps) to a dense
0..M-1 range, zeroes padded rows so the npz compresses, and rewrites
the meta capacities.

Usage: python scripts/trim_map_snapshot.py <ckpt.npz> <out.npz> [--no-desc]

--no-desc zeroes the (incompressible, random-bit) BRIEF descriptors —
the snapshot then carries geometry + observations + covisibility only,
which is everything bundle adjustment consumes; it compresses ~4x
smaller. Keep descriptors for snapshots meant for matching/reloc work.
"""

import sys

import numpy as np

KF_FIELDS_2D = [
    "kf_xy", "kf_octave", "kf_angle", "kf_desc", "kf_feat_valid",
    "kf_depth", "kf_ur", "kf_point_idx",
]
KF_FIELDS_1D = [
    "kf_valid", "kf_pose_R", "kf_pose_t", "kf_frame_id", "kf_timestamp",
    "kf_parent", "kf_tcp_R", "kf_tcp_t",
]
PT_FIELDS = [
    "pt_valid", "pt_pos", "pt_desc", "pt_normal", "pt_min_dist",
    "pt_max_dist", "pt_first_kf", "pt_visible", "pt_found",
]


def main(src: str, dst: str, no_desc: bool = False) -> int:
    d = dict(np.load(src).items())
    meta = d["_meta"].copy()
    nk = int(meta[0])

    out = {}
    for f in KF_FIELDS_1D:
        out[f] = d[f][:nk].copy()
    for f in KF_FIELDS_2D:
        out[f] = d[f][:nk].copy()
    # Zero padded feature rows (invalid features) so the npz compresses.
    feat_invalid = ~out["kf_feat_valid"].astype(bool)
    for f in ("kf_xy", "kf_octave", "kf_angle", "kf_depth", "kf_ur"):
        out[f][feat_invalid] = 0
    out["kf_desc"][feat_invalid] = 0
    out["kf_point_idx"][feat_invalid] = -1

    # Dense point-id remap: keep VALID points only; stale references in
    # kf_point_idx (to culled ids) become -1.
    pt_valid = d["pt_valid"].astype(bool)
    keep = np.where(pt_valid)[0]
    m = keep.size
    remap = np.full(d["pt_valid"].shape[0] + 1, -1, np.int64)
    remap[keep] = np.arange(m)
    for f in PT_FIELDS:
        out[f] = d[f][keep].copy()
    pidx = out["kf_point_idx"]
    ok = pidx >= 0
    pidx[ok] = remap[pidx[ok]]
    out["kf_point_idx"] = pidx

    if no_desc:
        out["kf_desc"][:] = 0
        out["pt_desc"][:] = 0

    out["cov_weight"] = d["cov_weight"][:nk, :nk].copy()
    out["_loop_edges"] = d["_loop_edges"]
    meta[0] = nk           # next_kf
    meta[1] = m            # next_pt
    meta[4] = nk           # max_keyframes capacity
    meta[5] = m            # max_points capacity
    out["_meta"] = meta
    np.savez_compressed(dst, **out)
    print(f"{src} -> {dst}: {nk} KFs, {m} points, "
          f"{sum(a.nbytes for a in out.values()) / 1e6:.1f} MB raw")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--no-desc" in sys.argv[3:]))
