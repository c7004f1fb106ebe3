"""Keyframe database: BoW place recognition for loops + relocalization.

TPU-native replacement for KeyFrameDatabase (reference:
src/KeyFrameDatabase.cc). The reference walks an inverted file of word ->
keyframe lists; here every keyframe's BoW vector is stored SPARSE — a
row of sorted word ids + L1-normalized TF-IDF weights, padded to the
per-keyframe feature budget — so shared-word counting and L1 scoring
against all keyframes are one vectorized searchsorted-intersection.
Memory is O(keyframes x features), independent of vocabulary size: a
production-scale vocabulary (ORBvoc.txt, ~1M words, as sized at
src/KeyFrame.cc:70-76) costs the same as a toy one. The candidate logic
is the retrieval equivalent of the reference's :86-216:

  detect_loop_candidates: exclude covisible KFs, keep > 0.8 * max common
  words, score > min_score, accumulate over covisibility groups (top-10),
  return best-of-group for groups > 0.75 * best accumulated score.

  detect_relocalization_candidates: same shape without the covisibility
  exclusion (:219-341).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from orb_slam2_commit_tpu.models.map_state import MapState
from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary


class KeyFrameDatabase:
    def __init__(self, vocabulary: BinaryVocabulary, max_keyframes: int):
        self.voc = vocabulary
        self.present = np.zeros(max_keyframes, bool)
        # Sparse BoW rows, allocated on first add (word capacity = that
        # keyframe's feature budget; unique words never exceed features).
        self.word_ids: np.ndarray | None = None   # [K, Wcap] int64, -1 pad
        self.weights: np.ndarray | None = None    # [K, Wcap] f32, 0 pad

    # ------------------------------------------------------------------

    def _ensure_cols(self, wcap: int) -> None:
        k = self.present.shape[0]
        if self.word_ids is None:
            self.word_ids = np.full((k, max(wcap, 1)), -1, np.int64)
            self.weights = np.zeros((k, max(wcap, 1)), np.float32)
        elif wcap > self.word_ids.shape[1]:
            extra = wcap - self.word_ids.shape[1]
            self.word_ids = np.concatenate(
                [self.word_ids, np.full((k, extra), -1, np.int64)], axis=1
            )
            self.weights = np.concatenate(
                [self.weights, np.zeros((k, extra), np.float32)], axis=1
            )

    def add(self, kf_id: int, desc: np.ndarray, valid: np.ndarray) -> None:
        words, _nodes = self.voc.transform(desc, valid)
        uw, wt = self.voc.sparse_bow(words)
        self._ensure_cols(uw.size)
        self.word_ids[kf_id] = -1
        self.weights[kf_id] = 0.0
        self.word_ids[kf_id, : uw.size] = uw
        self.weights[kf_id, : uw.size] = wt
        self.present[kf_id] = True

    def grow(self, kind: str, new_capacity: int) -> None:
        """MapState grow hook: keep the database sized with the map's
        keyframe capacity."""
        if kind != "keyframes" or new_capacity <= self.present.shape[0]:
            return
        extra = new_capacity - self.present.shape[0]
        if self.word_ids is not None:
            wcap = self.word_ids.shape[1]
            self.word_ids = np.concatenate(
                [self.word_ids, np.full((extra, wcap), -1, np.int64)]
            )
            self.weights = np.concatenate(
                [self.weights, np.zeros((extra, wcap), np.float32)]
            )
        self.present = np.concatenate([self.present, np.zeros(extra, bool)])

    def erase(self, kf_id: int) -> None:
        self.present[kf_id] = False
        if self.word_ids is not None:
            self.word_ids[kf_id] = -1
            self.weights[kf_id] = 0.0

    def clear(self) -> None:
        self.present[:] = False
        if self.word_ids is not None:
            self.word_ids[:] = -1
            self.weights[:] = 0.0

    # ------------------------------------------------------------------

    def kf_bow(self, kf_id: int) -> Tuple[np.ndarray, np.ndarray]:
        """Sparse BoW of a stored keyframe, UNPADDED (sorted unique word
        ids + weights). Callers feed this to searchsorted-based scoring,
        which requires a sorted array — the padded row (trailing -1s)
        is not one."""
        m = self.word_ids[kf_id] >= 0
        return self.word_ids[kf_id][m], self.weights[kf_id][m]

    def score_between(self, kf_a: int, kf_b: int) -> float:
        return self.voc.sparse_score(
            self.word_ids[kf_a], self.weights[kf_a],
            self.word_ids[kf_b], self.weights[kf_b],
        )

    def _common_words_and_scores(self, q_uw: np.ndarray, q_wt: np.ndarray):
        """Shared-word count + L1 score of the query against every stored
        row, as one vectorized sorted intersection."""
        k = self.present.shape[0]
        if self.word_ids is None or q_uw.size == 0:
            return np.zeros(k, np.float32), np.zeros(k, np.float32)
        W = self.word_ids                               # [K, Wcap]
        idx = np.clip(np.searchsorted(q_uw, W), 0, q_uw.size - 1)
        match = (q_uw[idx] == W) & (W >= 0)             # [K, Wcap]
        common = match.sum(axis=1).astype(np.float32)
        wq = np.where(match, q_wt[idx], 0.0)
        wk = np.where(match, self.weights, 0.0)
        inter_q = wq.sum(axis=1)
        inter_k = wk.sum(axis=1)
        inter_abs = np.abs(wq - wk).sum(axis=1)
        row_sum = self.weights.sum(axis=1)              # 1 for stored rows
        l1 = (q_wt.sum() - inter_q) + (row_sum - inter_k) + inter_abs
        scores = np.where(row_sum > 0, 1.0 - 0.5 * l1, 0.0)
        return common, scores.astype(np.float32)

    def detect_loop_candidates(
        self, map_state: MapState, kf_id: int, min_score: float
    ) -> List[int]:
        """Oracle: DetectLoopCandidates (src/KeyFrameDatabase.cc:76-216)."""
        common, scores = self._common_words_and_scores(*self.kf_bow(kf_id))
        connected = set(
            int(x) for x in map_state.covisible_keyframes(kf_id, None, 1)
        )
        eligible = self.present.copy()
        eligible[kf_id] = False
        for c in connected:
            eligible[c] = False
        if not eligible.any():
            return []
        max_common = common[eligible].max()
        if max_common == 0:
            return []
        min_common = 0.8 * max_common
        cand = np.where(eligible & (common > min_common) & (scores >= min_score))[0]
        if cand.size == 0:
            return []

        # Covisibility-group score accumulation (:159-192).
        cand_set = set(int(c) for c in cand)
        best_acc = 0.0
        groups = []
        for c in cand:
            group = [int(c)] + [
                int(x) for x in map_state.covisible_keyframes(int(c), 10, 1)
            ]
            acc = 0.0
            best_kf, best_s = int(c), scores[c]
            for g in group:
                if g in cand_set:
                    acc += scores[g]
                    if scores[g] > best_s:
                        best_kf, best_s = g, scores[g]
            groups.append((acc, best_kf))
            best_acc = max(best_acc, acc)

        th = 0.75 * best_acc
        out = []
        seen = set()
        for acc, best_kf in groups:
            if acc > th and best_kf not in seen:
                seen.add(best_kf)
                out.append(best_kf)
        return out

    def detect_relocalization_candidates(self, frame) -> List[int]:
        """Oracle: DetectRelocalizationCandidates
        (src/KeyFrameDatabase.cc:219-341). Accepts a Frame."""
        words, _ = self.voc.transform(frame.desc, frame.valid)
        common, scores = self._common_words_and_scores(
            *self.voc.sparse_bow(words)
        )
        eligible = self.present
        if not eligible.any():
            return []
        max_common = common[eligible].max()
        if max_common == 0:
            return []
        cand = np.where(eligible & (common > 0.8 * max_common))[0]
        if cand.size == 0:
            return []
        order = np.argsort(-scores[cand])
        return [int(c) for c in cand[order][:10]]
