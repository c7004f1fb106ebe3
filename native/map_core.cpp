// Native map-core: hot host-side bookkeeping for the array map state.
//
// The reference implements its entire runtime in C++ (KeyFrame covisibility
// bookkeeping, src/KeyFrame.cc:367-493; observation counting across the
// pointer graph). This module provides the same operations over the TPU
// build's flat arrays, callable from Python via ctypes:
//
//   covis_row     — shared-map-point counts between one keyframe and all
//                   others (replaces per-pair set intersection)
//   obs_counts    — per-point observation counts over the whole map
//   covis_matrix  — full covisibility recompute (load / loop-closure paths)
//
// Complexity: one pass over the observation table with a point->keyframe
// inverted index, O(total_observations), instead of O(K^2 * N log N)
// pairwise intersections.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// kf_point_idx: [K, N] int32 (-1 = no observation)
// kf_valid:     [K] uint8
// out_row:      [K] int32 — shared counts vs. keyframe `k`
void covis_row(const int32_t* kf_point_idx, const uint8_t* kf_valid,
               int64_t K, int64_t N, int64_t max_points, int64_t k,
               int32_t* out_row) {
    std::memset(out_row, 0, sizeof(int32_t) * K);
    if (!kf_valid[k]) return;
    // Mark the query keyframe's points.
    std::vector<uint8_t> mark(max_points, 0);
    const int32_t* row_k = kf_point_idx + k * N;
    for (int64_t i = 0; i < N; ++i) {
        int32_t p = row_k[i];
        if (p >= 0 && p < max_points) mark[p] = 1;
    }
    for (int64_t j = 0; j < K; ++j) {
        if (j == k || !kf_valid[j]) continue;
        const int32_t* row_j = kf_point_idx + j * N;
        int32_t c = 0;
        for (int64_t i = 0; i < N; ++i) {
            int32_t p = row_j[i];
            if (p >= 0 && p < max_points && mark[p]) ++c;
        }
        out_row[j] = c;
    }
}

// out_counts: [max_points] int32
void obs_counts(const int32_t* kf_point_idx, const uint8_t* kf_valid,
                int64_t K, int64_t N, int64_t max_points,
                int32_t* out_counts) {
    std::memset(out_counts, 0, sizeof(int32_t) * max_points);
    for (int64_t k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_point_idx + k * N;
        for (int64_t i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < max_points) ++out_counts[p];
        }
    }
}

// out: [K, K] int32 full covisibility matrix via a point->observers
// inverted index (single pass).
void covis_matrix(const int32_t* kf_point_idx, const uint8_t* kf_valid,
                  int64_t K, int64_t N, int64_t max_points,
                  int32_t* out) {
    std::memset(out, 0, sizeof(int32_t) * K * K);
    // Inverted index: first pass counts, second fills.
    std::vector<int32_t> counts(max_points, 0);
    for (int64_t k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_point_idx + k * N;
        for (int64_t i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < max_points) ++counts[p];
        }
    }
    std::vector<int64_t> offsets(max_points + 1, 0);
    for (int64_t p = 0; p < max_points; ++p)
        offsets[p + 1] = offsets[p] + counts[p];
    std::vector<int32_t> observers(offsets[max_points]);
    std::vector<int64_t> cursor(offsets.begin(), offsets.end() - 1);
    for (int64_t k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_point_idx + k * N;
        for (int64_t i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < max_points)
                observers[cursor[p]++] = static_cast<int32_t>(k);
        }
    }
    // For each point, bump every observer pair.
    for (int64_t p = 0; p < max_points; ++p) {
        int64_t lo = offsets[p], hi = offsets[p + 1];
        for (int64_t a = lo; a < hi; ++a) {
            for (int64_t b = a + 1; b < hi; ++b) {
                int32_t ka = observers[a], kb = observers[b];
                ++out[(int64_t)ka * K + kb];
                ++out[(int64_t)kb * K + ka];
            }
        }
    }
}

}  // extern "C"
