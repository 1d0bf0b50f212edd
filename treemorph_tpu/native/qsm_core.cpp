// Native host-side kernels for the QSM fitting stage.
//
// The stage-3 sphere-following loop is CPU-bound (reference profile,
// SURVEY.md §3.3): every popped sphere runs a DBSCAN over the pairwise
// angular distances of its shell points (QSMFittingDepthFirst.py:115-148)
// thousands of times per tree with small matrices, where sklearn's
// per-call overhead dominates. This file provides a plain C ABI consumed
// through ctypes (no pybind11 / Python headers needed).
//
// Build:  g++ -O3 -march=native -shared -fPIC qsm_core.cpp -o libqsm_core.so
// (done automatically on first import by treemorph_tpu.native)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// DBSCAN over a precomputed (n x n) distance matrix, sklearn semantics:
// core point = >= min_samples neighbors within eps (including itself);
// clusters grow through core points only; border points adopt the label
// of the first core point that reaches them; noise = -1.
void dbscan_precomputed(const float* dist, int32_t n, float eps,
                        int32_t min_samples, int32_t* labels) {
    std::vector<int32_t> neighbor_count(n, 0);
    for (int32_t i = 0; i < n; ++i) {
        const float* row = dist + (int64_t)i * n;
        int32_t c = 0;
        for (int32_t j = 0; j < n; ++j) c += (row[j] <= eps);
        neighbor_count[i] = c;
    }

    for (int32_t i = 0; i < n; ++i) labels[i] = -1;
    std::vector<uint8_t> in_queue(n, 0);
    std::vector<int32_t> queue;
    queue.reserve(n);

    int32_t cluster = 0;
    for (int32_t i = 0; i < n; ++i) {
        if (labels[i] != -1 || neighbor_count[i] < min_samples) continue;
        // start a new cluster from core point i
        queue.clear();
        std::fill(in_queue.begin(), in_queue.end(), 0);
        labels[i] = cluster;
        queue.push_back(i);
        in_queue[i] = 1;
        for (size_t qi = 0; qi < queue.size(); ++qi) {
            int32_t p = queue[qi];
            if (neighbor_count[p] < min_samples) continue;  // border
            const float* row = dist + (int64_t)p * n;
            for (int32_t j = 0; j < n; ++j) {
                if (row[j] <= eps && labels[j] == -1) {
                    labels[j] = cluster;
                    if (!in_queue[j]) {
                        queue.push_back(j);
                        in_queue[j] = 1;
                    }
                }
            }
        }
        ++cluster;
    }
}

// Pairwise angular distances between unit vectors (n x 3, row-major):
// out[i, j] = acos(clip(dot(u_i, u_j), -1, 1)).
void angular_distance_matrix(const float* unit, int32_t n, float* out) {
    for (int32_t i = 0; i < n; ++i) {
        const float* a = unit + (int64_t)i * 3;
        float* row = out + (int64_t)i * n;
        for (int32_t j = 0; j < n; ++j) {
            const float* b = unit + (int64_t)j * 3;
            float d = a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
            if (d > 1.0f) d = 1.0f;
            if (d < -1.0f) d = -1.0f;
            row[j] = acosf(d);
        }
    }
}

// Euclidean flood-fill clustering (reference cluster_labels_euclidian,
// QSMFittingDepthFirst.py:859-886) over raw 3D points, brute force —
// shell point sets are small (tens to hundreds).
void euclidean_cluster(const float* pts, int32_t n, float eps,
                       int32_t min_cluster_size, int32_t* labels) {
    const float eps2 = eps * eps;
    for (int32_t i = 0; i < n; ++i) labels[i] = -1;
    std::vector<int32_t> queue;
    queue.reserve(n);
    int32_t cluster = 0;
    for (int32_t i = 0; i < n; ++i) {
        if (labels[i] != -1) continue;
        // count neighborhood
        int32_t cnt = 0;
        for (int32_t j = 0; j < n; ++j) {
            float dx = pts[3 * i] - pts[3 * j];
            float dy = pts[3 * i + 1] - pts[3 * j + 1];
            float dz = pts[3 * i + 2] - pts[3 * j + 2];
            cnt += (dx * dx + dy * dy + dz * dz <= eps2);
        }
        if (cnt < min_cluster_size) continue;
        queue.clear();
        labels[i] = cluster;
        queue.push_back(i);
        for (size_t qi = 0; qi < queue.size(); ++qi) {
            int32_t p = queue[qi];
            for (int32_t j = 0; j < n; ++j) {
                if (labels[j] != -1) continue;
                float dx = pts[3 * p] - pts[3 * j];
                float dy = pts[3 * p + 1] - pts[3 * j + 1];
                float dz = pts[3 * p + 2] - pts[3 * j + 2];
                if (dx * dx + dy * dy + dz * dz <= eps2) {
                    labels[j] = cluster;
                    queue.push_back(j);
                }
            }
        }
        ++cluster;
    }
}

}  // extern "C"
