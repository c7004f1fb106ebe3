"""Keyframe database: BoW place recognition for loops + relocalization.

TPU-native replacement for KeyFrameDatabase (reference:
src/KeyFrameDatabase.cc). The reference walks an inverted file of word ->
keyframe lists; here keyframe BoW vectors live in one dense [K, W] matrix,
so shared-word counting and L1 scoring are two matmuls — the retrieval
equivalent of the reference's :86-216 candidate logic:

  detect_loop_candidates: exclude covisible KFs, keep > 0.8 * max common
  words, score > min_score, accumulate over covisibility groups (top-10),
  return best-of-group for groups > 0.75 * best accumulated score.

  detect_relocalization_candidates: same shape without the covisibility
  exclusion (:219-341).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from orb_slam2_commit_tpu.models.map_state import MapState
from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary


class KeyFrameDatabase:
    def __init__(self, vocabulary: BinaryVocabulary, max_keyframes: int):
        self.voc = vocabulary
        self.bow = np.zeros((max_keyframes, vocabulary.n_words), np.float32)
        self.present = np.zeros(max_keyframes, bool)
        # Cached word ids / mid-level nodes per KF (for BoW matching).
        self.words: dict = {}
        self.nodes: dict = {}

    # ------------------------------------------------------------------

    def add(self, kf_id: int, desc: np.ndarray, valid: np.ndarray) -> None:
        words, nodes = self.voc.transform(desc, valid)
        self.bow[kf_id] = self.voc.bow_vector(words)
        self.present[kf_id] = True
        self.words[kf_id] = words
        self.nodes[kf_id] = nodes

    def grow(self, kind: str, new_capacity: int) -> None:
        """MapState grow hook: keep the inverted file sized with the map's
        keyframe capacity."""
        if kind != "keyframes" or new_capacity <= self.present.shape[0]:
            return
        extra = new_capacity - self.present.shape[0]
        self.bow = np.concatenate(
            [self.bow, np.zeros((extra, self.bow.shape[1]), self.bow.dtype)]
        )
        self.present = np.concatenate([self.present, np.zeros(extra, bool)])

    def erase(self, kf_id: int) -> None:
        self.present[kf_id] = False
        self.bow[kf_id] = 0
        self.words.pop(kf_id, None)
        self.nodes.pop(kf_id, None)

    # ------------------------------------------------------------------

    def _common_words_and_scores(self, v: np.ndarray):
        has_word = self.bow > 0
        common = has_word @ (v > 0).astype(np.float32)
        scores = 1.0 - 0.5 * np.abs(self.bow - v[None]).sum(axis=1)
        return common, scores

    def detect_loop_candidates(
        self, map_state: MapState, kf_id: int, min_score: float
    ) -> List[int]:
        """Oracle: DetectLoopCandidates (src/KeyFrameDatabase.cc:76-216)."""
        v = self.bow[kf_id]
        connected = set(
            int(x) for x in map_state.covisible_keyframes(kf_id, None, 1)
        )
        common, scores = self._common_words_and_scores(v)
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
        v = self.voc.bow_vector(words)
        common, scores = self._common_words_and_scores(v)
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
