"""Binary BoW vocabulary: hierarchical k-means tree over ORB descriptors.

TPU-native replacement for DBoW2's TemplatedVocabulary (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h): a k-branch, L-level tree of
binary descriptors with TF-IDF weighting (:942-996) and L1 scoring
(:1198-1203). The tree is stored as flat arrays (children table + packed
node descriptors) and transform() descends it for ALL features at once:
one gather + XOR + popcount + argmin per level (:1218-1259 batched).

Training builds the tree with bitwise-majority k-means (DBoW2's meanValue
+ kmeans++ seeding) on the host — an offline step, like the reference's
pre-trained ORBvoc.txt.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_WORDS_DEFAULT_K = 10
N_WORDS_DEFAULT_L = 6


_POPCOUNT_LUT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(1).astype(np.uint16)


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    """Popcount over packed uint32 rows [..., 8] -> [...]."""
    b = x.view(np.uint8).reshape(x.shape[:-1] + (32,))
    return _POPCOUNT_LUT[b].sum(-1)


def _majority_descriptor(descs: np.ndarray) -> np.ndarray:
    """Bitwise-majority mean of packed descriptors (DBoW2 FORB::meanValue)."""
    bits = np.unpackbits(
        descs.view(np.uint8).reshape(descs.shape[0], 32), axis=-1
    )  # [n, 256]
    maj = (bits.sum(0) * 2 >= descs.shape[0]).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


def _hamming_to(centroids: np.ndarray, descs: np.ndarray) -> np.ndarray:
    """[n, c] distances (chunked so n*c*32 bytes never materialises at
    vocabulary-training scale)."""
    n, c = descs.shape[0], centroids.shape[0]
    out = np.empty((n, c), np.uint16)
    chunk = max(1, (1 << 24) // max(c * 32, 1))
    for s in range(0, n, chunk):
        x = descs[s : s + chunk, None, :] ^ centroids[None, :, :]
        out[s : s + chunk] = _popcount_rows(x)
    return out


def _kmeans_binary(descs: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-means with majority centroids; returns (centroids, labels)."""
    n = descs.shape[0]
    k = min(k, n)
    # kmeans++ seeding.
    first = rng.integers(n)
    centroids = [descs[first]]
    d2 = _hamming_to(np.asarray(centroids), descs)[:, 0].astype(np.float64)
    for _ in range(1, k):
        probs = d2 / max(d2.sum(), 1e-9)
        nxt = rng.choice(n, p=probs)
        centroids.append(descs[nxt])
        d_new = _hamming_to(descs[nxt][None], descs)[:, 0]
        d2 = np.minimum(d2, d_new)
    centroids = np.stack(centroids)
    labels = np.zeros(n, np.int64)
    for _ in range(iters):
        d = _hamming_to(centroids, descs)
        new_labels = d.argmin(1)
        if (new_labels == labels).all():
            labels = new_labels
            break
        labels = new_labels
        for c in range(k):
            sel = labels == c
            if sel.any():
                centroids[c] = _majority_descriptor(descs[sel])
    return centroids, labels


@dataclasses.dataclass
class BinaryVocabulary:
    k: int
    levels: int
    children: np.ndarray     # [n_nodes, k] int32, -1 absent
    node_desc: np.ndarray    # [n_nodes, 8] uint32
    node_level: np.ndarray   # [n_nodes] int32 (root = 0)
    word_id: np.ndarray      # [n_nodes] int32, -1 for internal nodes
    word_weight: np.ndarray  # [n_words] float32 (idf)
    n_words: int

    # ------------------------------------------------------------------

    @classmethod
    def train(
        cls,
        descriptors: np.ndarray,
        k: int = 9,
        levels: int = 3,
        seed: int = 0,
    ) -> "BinaryVocabulary":
        """Hierarchical k-means over [N, 8] packed descriptors
        (oracle: TemplatedVocabulary::create, HKmeansStep)."""
        rng = np.random.default_rng(seed)
        children_list = [[-1] * k]   # root
        desc_list = [np.zeros(8, np.uint32)]
        level_list = [0]
        word_list = [-1]
        word_count = 0
        word_hits: list = []

        def build(node_id: int, descs: np.ndarray, level: int):
            nonlocal word_count
            if level == levels or descs.shape[0] <= 1:
                word_list[node_id] = word_count
                word_hits.append(descs.shape[0])
                word_count += 1
                return
            cents, labels = _kmeans_binary(descs, k, rng)
            for c in range(cents.shape[0]):
                child_id = len(children_list)
                children_list.append([-1] * k)
                desc_list.append(cents[c])
                level_list.append(level + 1)
                word_list.append(-1)
                children_list[node_id][c] = child_id
                build(child_id, descs[labels == c], level + 1)

        build(0, descriptors.astype(np.uint32), 0)

        n_nodes = len(children_list)
        children = np.asarray(children_list, np.int32)
        # Fill absent children with self-pointing dummy (argmin never picks
        # them thanks to +inf distance handling in transform).
        word_id = np.asarray(word_list, np.int32)
        # IDF weights from the training corpus occupancy (DBoW2 TF_IDF:
        # idf = log(N / n_i), :942-996). Every word seen at least once.
        n_train = max(descriptors.shape[0], 1)
        hits = np.maximum(np.asarray(word_hits, np.float64), 1.0)
        weights = np.log(n_train / hits).astype(np.float32)
        weights = np.maximum(weights, 1e-3)
        return cls(
            k=k,
            levels=levels,
            children=children,
            node_desc=np.stack(desc_list).astype(np.uint32),
            node_level=np.asarray(level_list, np.int32),
            word_id=word_id,
            word_weight=weights,
            n_words=word_count,
        )

    # ------------------------------------------------------------------

    def device_arrays(self):
        """Tree tables as device arrays, uploaded ONCE per vocabulary.

        jnp.asarray on a NumPy array makes a fresh device buffer every
        call — at production vocabulary scale (L=6: ~53 MB of tables)
        an uncached upload per transform costs seconds through a remote
        tunnel and dominates the mapper. Cached on first use; the tree
        is immutable after construction."""
        cached = self.__dict__.get("_device_cache")
        if cached is None:
            cached = (
                jnp.asarray(self.children),
                jnp.asarray(self.node_desc),
                jnp.asarray(self.word_id),
            )
            self.__dict__["_device_cache"] = cached
        return cached

    def transform(
        self, desc: np.ndarray, valid: np.ndarray,
        levels_up: int = 2,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched tree descent: [N, 8] descriptors -> (word ids [N],
        mid-level node ids [N]) with -1 for invalid features.

        Oracle: TemplatedVocabulary::transform(feature, word, node, levelsup)
        (TemplatedVocabulary.h:1218-1259). The node id at depth
        levels - levels_up feeds BoW-constrained matching (FeatureVector).
        """
        words, nodes = _transform_device(
            jnp.asarray(desc), *self.device_arrays(),
            self.levels, levels_up,
        )
        words = np.where(valid, np.asarray(words), -1)
        nodes = np.where(valid, np.asarray(nodes), -1)
        return words, nodes

    def bow_vector(self, words: np.ndarray) -> np.ndarray:
        """Dense L1-normalized TF-IDF vector [n_words] from word ids
        (negatives ignored)."""
        v = np.zeros(self.n_words, np.float32)
        w = words[words >= 0]
        np.add.at(v, w, self.word_weight[w])
        s = v.sum()
        return v / s if s > 0 else v

    @staticmethod
    def score(v1: np.ndarray, v2: np.ndarray) -> float:
        """DBoW2 L1 score in [0, 1] (ScoringObject.h L1Scoring):
        s = 1 - 0.5 * |v1 - v2|_1 for L1-normalized vectors."""
        return float(1.0 - 0.5 * np.abs(v1 - v2).sum())

    def sparse_bow(
        self, words: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Sparse L1-normalized TF-IDF vector from word ids: (sorted
        unique word ids [U] int64, weights [U] f32). The sparse twin of
        bow_vector — memory independent of vocabulary size, which is what
        a production ORBvoc.txt (~1M words) requires (the reference's
        BowVector is likewise a sparse map, DBoW2/BowVector.h)."""
        w = words[words >= 0]
        if w.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        uw, inv = np.unique(w, return_inverse=True)
        wt = np.zeros(uw.size, np.float32)
        np.add.at(wt, inv, self.word_weight[w])
        s = wt.sum()
        if s > 0:
            wt /= s
        return uw.astype(np.int64), wt

    @staticmethod
    def sparse_score(
        uw1: np.ndarray, wt1: np.ndarray, uw2: np.ndarray, wt2: np.ndarray
    ) -> float:
        """L1 score between two sparse BoW vectors (uw sorted unique,
        padding entries uw < 0 / wt == 0 allowed). Identical value to
        score(dense(v1), dense(v2)); empty vectors score 0."""
        m1 = uw1 >= 0
        m2 = uw2 >= 0
        uw1, wt1 = uw1[m1], wt1[m1]
        uw2, wt2 = uw2[m2], wt2[m2]
        if uw1.size == 0 or uw2.size == 0:
            return 0.0
        idx = np.clip(np.searchsorted(uw1, uw2), 0, uw1.size - 1)
        match = uw1[idx] == uw2
        inter1 = wt1[idx][match]
        inter2 = wt2[match]
        l1 = (
            (wt1.sum() - inter1.sum())
            + (wt2.sum() - inter2.sum())
            + np.abs(inter1 - inter2).sum()
        )
        return float(1.0 - 0.5 * l1)

    # ------------------------------------------------------------------
    # Text serialization (same row layout as the reference's ORBvoc.txt:
    # "k L s1 s2" header, then "parent isLeaf 32-bytes weight" rows,
    # TemplatedVocabulary.h:1338-1417)
    # ------------------------------------------------------------------

    def save_text(self, path: str) -> None:
        # Vectorized parent table (a per-row linear search is O(n^2) and
        # unusable at 1e5-word scale).
        n_nodes = self.children.shape[0]
        parent = np.full(n_nodes, -1, np.int64)
        rows, cols = np.nonzero(self.children >= 0)
        parent[self.children[rows, cols]] = rows
        with open(path, "w") as f:
            f.write(f"{self.k} {self.levels} 0 0\n")
            for nid in range(1, n_nodes):
                is_leaf = int(self.word_id[nid] >= 0)
                byts = self.node_desc[nid].view(np.uint8)
                wt = (
                    self.word_weight[self.word_id[nid]]
                    if is_leaf
                    else 0.0
                )
                f.write(
                    f"{parent[nid]} {is_leaf} "
                    + " ".join(str(int(b)) for b in byts)
                    + f" {wt}\n"
                )

    def save_npz(self, path: str) -> None:
        """Compact binary save (the ~1e5-word default vocabulary ships in
        this format; save_text keeps ORBvoc.txt-layout parity)."""
        np.savez_compressed(
            path, k=self.k, levels=self.levels, children=self.children,
            node_desc=self.node_desc, node_level=self.node_level,
            word_id=self.word_id, word_weight=self.word_weight,
            n_words=self.n_words,
        )

    @classmethod
    def load_npz(cls, path: str) -> "BinaryVocabulary":
        z = np.load(path)
        return cls(
            k=int(z["k"]), levels=int(z["levels"]), children=z["children"],
            node_desc=z["node_desc"], node_level=z["node_level"],
            word_id=z["word_id"], word_weight=z["word_weight"],
            n_words=int(z["n_words"]),
        )

    @classmethod
    def load_text(cls, path: str) -> "BinaryVocabulary":
        with open(path) as f:
            header = f.readline().split()
            k, levels = int(header[0]), int(header[1])
            rows = [line.split() for line in f if line.strip()]
        n_nodes = len(rows) + 1
        children = np.full((n_nodes, k), -1, np.int32)
        node_desc = np.zeros((n_nodes, 8), np.uint32)
        node_level = np.zeros(n_nodes, np.int32)
        word_id = np.full(n_nodes, -1, np.int32)
        weights = []
        child_count = np.zeros(n_nodes, np.int32)
        word_count = 0
        for nid, row in enumerate(rows, start=1):
            parent = int(row[0])
            is_leaf = int(row[1])
            byts = np.asarray([int(x) for x in row[2:34]], np.uint8)
            node_desc[nid] = byts.view(np.uint32)
            children[parent, child_count[parent]] = nid
            child_count[parent] += 1
            node_level[nid] = node_level[parent] + 1
            if is_leaf:
                word_id[nid] = word_count
                weights.append(float(row[34]))
                word_count += 1
        return cls(
            k=k, levels=levels, children=children, node_desc=node_desc,
            node_level=node_level, word_id=word_id,
            word_weight=np.asarray(weights, np.float32),
            n_words=word_count,
        )


_DEFAULT_VOC_CACHE: list = []


def default_vocabulary() -> Optional["BinaryVocabulary"]:
    """The bundled default vocabulary (data/default_voc.npz, trained by
    scripts/train_vocab.py at DBoW2-class scale), loaded once per process.
    Returns None when the file is absent — the counterpart of the
    reference's mandatory ORBvoc.txt load (src/System.cc:61-77), made
    optional so the engine still runs without place recognition."""
    if not _DEFAULT_VOC_CACHE:
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "default_voc.npz",
        )
        _DEFAULT_VOC_CACHE.append(
            BinaryVocabulary.load_npz(path) if os.path.exists(path) else None
        )
    return _DEFAULT_VOC_CACHE[0]


def load_vocabulary(path: str) -> "BinaryVocabulary":
    """Load a vocabulary, dispatching on extension: .npz (the bundled
    binary format) or the reference's ORBvoc.txt row layout."""
    if path.endswith(".npz"):
        return BinaryVocabulary.load_npz(path)
    return BinaryVocabulary.load_text(path)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _transform_device(
    desc: jnp.ndarray,
    children: jnp.ndarray,
    node_desc: jnp.ndarray,
    word_id: jnp.ndarray,
    levels: int,
    levels_up: int,
):
    """Descend the tree for all descriptors at once.

    Per level: gather the k child descriptors of each feature's current
    node, XOR + popcount against the feature descriptor, argmin. Missing
    children (-1) get +inf distance. Leaf nodes self-loop (children all
    -1 -> stay, matching variable-depth trees).
    """
    n = desc.shape[0]
    current = jnp.zeros(n, jnp.int32)
    mid_level = max(levels - levels_up, 0)
    mid_nodes = jnp.zeros(n, jnp.int32)

    for level in range(levels):
        ch = children[current]                        # [n, k]
        has = ch >= 0
        ch_safe = jnp.maximum(ch, 0)
        cd = node_desc[ch_safe]                       # [n, k, 8]
        x = jnp.bitwise_xor(cd, desc[:, None, :])
        dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
        dist = jnp.where(has, dist, jnp.int32(1 << 20))
        best = jnp.argmin(dist, axis=1).astype(jnp.int32)
        nxt = jnp.take_along_axis(ch_safe, best[:, None], axis=1)[:, 0]
        # Stay at a leaf whose children are absent.
        any_child = jnp.any(has, axis=1)
        current = jnp.where(any_child, nxt, current)
        if level + 1 == mid_level or (mid_level == 0 and level == 0):
            mid_nodes = current
    if mid_level == 0:
        mid_nodes = jnp.zeros(n, jnp.int32)
    return word_id[current], mid_nodes
