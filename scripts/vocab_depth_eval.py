"""Measured vocabulary-depth justification (VERDICT r3 item 8).

The reference ships a ~1M-word k=10/L=6 ORBvoc (TemplatedVocabulary.h:1338,
assumed at src/KeyFrame.cc:70-76); the bundled vocabulary here is
k=10/L=5 (~90k words). Word count matters exactly when unrelated frames
collide in the inverted file — so this experiment MEASURES retrieval
quality as a function of effective tree depth on rendered imagery at the
engine's feature budget.

Method: the shipped L=5 tree is evaluated at effective depths
L' = 3, 4, 5 by replacing each word with its level-L' ancestor
(transform(levels_up = 5 - L')) — each L' is exactly an L'-level
vocabulary with identical training. For a database of distinct rendered
"places" and re-observation queries (viewpoint change + feature churn):

  * top-1 retrieval precision,
  * mean score margin (true place vs best impostor),
  * mean shared-word count between UNRELATED frames (the collision
    statistic that the 0.8*maxCommonWords gate of DetectLoopCandidates
    depends on, src/KeyFrameDatabase.cc:124-151).

If the margin/collision curves saturate L=4 -> L=5, a further 10x to
L=6 cannot improve retrieval at this feature budget and the L=5
vocabulary is justified; if they do not, L=6 training is warranted.

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/vocab_depth_eval.py
Writes VOCAB_DEPTH.json at repo root.
"""

import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_commit_tpu.models.vocabulary import default_vocabulary
from orb_slam2_commit_tpu.slam.frame import make_frame
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


def place_frames(n_places: int = 40, seed: int = 0, noisy: bool = False):
    """(db_frame_desc, query_desc) per place: two viewpoints of each
    rendered scene, full extraction pipeline, engine feature budget.

    noisy=True degrades the QUERY view with the camera model
    (sigma=4 read + shot noise, alternating 0.8x/1.2x exposure shifts)
    while the database view stays clean — the asymmetric re-observation
    a relocalizing/loop-closing tracker actually faces (VERDICT r04
    missing #2: retrieval precision was only ever measured noise-free)."""
    cfg = synthetic_config(width=512, height=384, n_features=1200)
    db, queries = [], []
    for s in range(n_places):
        images, poses, scene = synthetic.render_sequence(
            cfg.camera, n_frames=8, n_points=700, seed=1000 + seed + s,
            step=0.06, motion="sweep" if s % 2 else "forward",
            depth_range=(2.0, 8.0), spread=4.0,
        )
        q_img = images[-1]
        if noisy:
            gain = 0.8 if s % 2 else 1.2
            ph = synthetic.Photometry(
                noise_sigma=4.0, shot_noise=2.0,
                gain_range=(gain, gain),
                bias_range=(-5.0, 5.0),
            )
            q_img = synthetic.apply_photometry(
                q_img, ph, seed=2000 + s, frame_idx=0
            )
        f0 = make_frame(images[0], 0, 0.0, cfg)
        f1 = make_frame(q_img, 1, 1.0, cfg)   # viewpoint change
        db.append(f0.desc[f0.valid])
        queries.append(f1.desc[f1.valid])
        print(f"place {s}: db {db[-1].shape[0]} / q {queries[-1].shape[0]}",
              flush=True)
    return db, queries


def eval_depth(voc, db, queries, depth: int):
    lu = voc.levels - depth

    def bow(desc):
        words, nodes = voc.transform(desc, np.ones(desc.shape[0], bool),
                                     levels_up=max(lu, 0))
        if lu > 0:
            words = nodes  # ancestor ids at depth L' = levels - lu
        # Occurrence counts with uniform weights at every depth (idf is
        # defined per leaf word only — uniform weighting is the fair
        # depth-L' comparison; the shipped depth-5 TF-IDF path is
        # reported separately by eval_leaf_tfidf).
        w = words[words >= 0]
        uw, cnt = np.unique(w, return_counts=True)
        wt = cnt.astype(np.float32)
        wt /= max(wt.sum(), 1e-9)
        return uw.astype(np.int64), wt

    db_bows = [bow(d) for d in db]
    n = len(db)
    correct = 0
    margins = []
    collisions = []
    for i, q in enumerate(queries):
        qb = bow(q)
        scores = np.array([voc.sparse_score(*qb, *b) for b in db_bows])
        j = int(np.argmax(scores))
        if j == i:
            correct += 1
        impostor = np.max(np.delete(scores, i)) if n > 1 else 0.0
        margins.append(float(scores[i] - impostor))
        # Shared words with unrelated places (collision statistic).
        for k in range(n):
            if k == i:
                continue
            uw_q = qb[0]
            uw_k = db_bows[k][0]
            idx = np.clip(np.searchsorted(uw_q, uw_k), 0, uw_q.size - 1)
            collisions.append(int((uw_q[idx] == uw_k).sum()))
    return {
        "depth": depth,
        "n_words_effective": int(10 ** depth),
        "precision_top1": correct / n,
        "mean_margin": float(np.mean(margins)),
        "p10_margin": float(np.percentile(margins, 10)),
        "mean_unrelated_shared_words": float(np.mean(collisions)),
    }


def main():
    # Optional: evaluate a specific vocabulary file (e.g. the L=6 train)
    # instead of the shipped default; second arg = output json path.
    noisy = "--noise" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--noise"]
    if args:
        from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary

        voc = BinaryVocabulary.load_npz(args[0])
    else:
        voc = default_vocabulary()
    out_path = args[1] if len(args) > 1 else (
        "VOCAB_NOISY.json" if noisy else "VOCAB_DEPTH.json"
    )
    assert voc is not None
    db, queries = place_frames(noisy=noisy)
    out = {"vocab_words": int(voc.n_words), "k": voc.k, "L": voc.levels,
           "n_places": len(db), "noisy_queries": noisy,
           "feature_budget": int(np.mean([d.shape[0] for d in db])),
           "depths": []}
    for depth in range(2, voc.levels + 1):
        r = eval_depth(voc, db, queries, depth)
        out["depths"].append(r)
        print(json.dumps(r), flush=True)
    # The shipped production path: depth-5 leaves with TF-IDF weights.
    def tfidf_bow(desc):
        words, _ = voc.transform(desc, np.ones(desc.shape[0], bool))
        return voc.sparse_bow(words)

    db_bows = [tfidf_bow(d) for d in db]
    correct = 0
    margins = []
    for i, q in enumerate(queries):
        qb = tfidf_bow(q)
        scores = np.array([voc.sparse_score(*qb, *b) for b in db_bows])
        if int(np.argmax(scores)) == i:
            correct += 1
        impostor = np.max(np.delete(scores, i))
        margins.append(float(scores[i] - impostor))
    out["leaf_tfidf"] = {
        "precision_top1": correct / len(db),
        "mean_margin": float(np.mean(margins)),
        "p10_margin": float(np.percentile(margins, 10)),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
