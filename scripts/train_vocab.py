"""Train the bundled default vocabulary at real DBoW2 scale.

The reference ships a ~1M-word k=10/L=6 ORBvoc.txt trained on Bovisa
(TemplatedVocabulary.h:1338; assumed at src/KeyFrame.cc:70-76). This
environment has zero egress, so the bundled vocabulary is trained from
ORB descriptors extracted off synthetic rendered scenes, augmented with
bit-flip jitter (viewpoint noise surrogate), at k=10 / L=5 (~1e5 words).

Usage:
  PYTHONPATH=. python scripts/train_vocab.py [k] [L] [out.npz]

Writes orb_slam2_commit_tpu/data/default_voc.npz by default.
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary
from orb_slam2_commit_tpu.slam.frame import make_frame
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


def build_corpus(n_scenes: int = 3, n_frames: int = 12,
                 flips_per_desc: int = 9, flip_bits: int = 12,
                 seed: int = 0) -> np.ndarray:
    cfg = synthetic_config(width=640, height=480, n_features=1500)
    rng = np.random.default_rng(seed)
    base = []
    for s in range(n_scenes):
        images, poses, scene = synthetic.render_sequence(
            cfg.camera, n_frames=n_frames, n_points=900, seed=100 + s,
            step=0.04, motion="sweep" if s % 2 else "forward",
            depth_range=(1.5, 6.0), spread=3.0,
        )
        images = np.clip(np.round(images), 0, 255).astype(np.uint8)
        for i in range(images.shape[0]):
            fr = make_frame(images[i], i, i / 30.0, cfg)
            base.append(fr.desc[fr.valid])
            print(f"scene {s} frame {i}: {int(fr.valid.sum())} descs")
    base = np.concatenate(base)
    # Bit-flip augmentation: each descriptor spawns jittered copies, the
    # same local cluster structure matching noise creates across views.
    bits = np.unpackbits(base.view(np.uint8).reshape(base.shape[0], 32), axis=1)
    out = [base]
    for _ in range(flips_per_desc):
        flips = np.zeros_like(bits)
        pos = rng.integers(0, 256, size=(bits.shape[0], flip_bits))
        np.put_along_axis(flips, pos, 1, axis=1)
        out.append(np.packbits(bits ^ flips, axis=1).view(np.uint32))
    corpus = np.concatenate(out)
    rng.shuffle(corpus)
    return corpus


def main():
    # Corpus scaling via env (an L=6 train wants a few-x bigger corpus:
    # ORB_VOC_SCENES=6 ORB_VOC_FRAMES=16 ORB_VOC_FLIPS=11).
    global build_corpus
    n_scenes = int(os.environ.get("ORB_VOC_SCENES", 3))
    n_frames = int(os.environ.get("ORB_VOC_FRAMES", 12))
    flips = int(os.environ.get("ORB_VOC_FLIPS", 9))
    _orig = build_corpus
    build_corpus = lambda: _orig(n_scenes, n_frames, flips)  # noqa: E731
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "orb_slam2_commit_tpu", "data", "default_voc.npz",
    )
    t0 = time.time()
    corpus = build_corpus()
    print(f"corpus: {corpus.shape[0]} descriptors "
          f"({time.time()-t0:.0f}s)")
    t0 = time.time()
    voc = BinaryVocabulary.train(corpus, k=k, levels=L, seed=1)
    print(f"trained k={k} L={L}: {voc.n_words} words, "
          f"{voc.children.shape[0]} nodes ({time.time()-t0:.0f}s)")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    voc.save_npz(out)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
