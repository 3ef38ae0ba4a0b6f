// Farthest-point sampling over mesh vertices (host preprocessing).
//
// TPU-native replacement for the reference's cffi extension
// (core/csrc/fps/src/farthest_point_sampling.cpp): same O(K*N) greedy
// algorithm with an incremental min-distance table, OpenMP-parallel over the
// distance update. Exposed through ctypes (native/build.sh -> libself6dpp.so).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// points: N x 3 float32; out_idx: K int32; init_center: if nonzero, seed from
// the point closest to the centroid, else from index 0.
void farthest_point_sampling(const float* points, int64_t n, int64_t k,
                             int32_t* out_idx, int32_t init_center) {
    if (n <= 0 || k <= 0) return;

    int64_t first = 0;
    if (init_center) {
        double cx = 0, cy = 0, cz = 0;
        for (int64_t i = 0; i < n; ++i) {
            cx += points[3 * i];
            cy += points[3 * i + 1];
            cz += points[3 * i + 2];
        }
        cx /= n; cy /= n; cz /= n;
        double best = std::numeric_limits<double>::max();
        for (int64_t i = 0; i < n; ++i) {
            double dx = points[3 * i] - cx, dy = points[3 * i + 1] - cy,
                   dz = points[3 * i + 2] - cz;
            double d = dx * dx + dy * dy + dz * dz;
            if (d < best) { best = d; first = i; }
        }
    }

    float* mind = new float[n];
    for (int64_t i = 0; i < n; ++i) mind[i] = std::numeric_limits<float>::max();

    int64_t cur = first;
    for (int64_t j = 0; j < k; ++j) {
        out_idx[j] = (int32_t)cur;
        const float px = points[3 * cur], py = points[3 * cur + 1],
                    pz = points[3 * cur + 2];
        float best = -1.0f;
        int64_t besti = 0;
#ifdef _OPENMP
#pragma omp parallel
        {
            float lbest = -1.0f; int64_t lbesti = 0;
#pragma omp for nowait
            for (int64_t i = 0; i < n; ++i) {
                float dx = points[3 * i] - px, dy = points[3 * i + 1] - py,
                      dz = points[3 * i + 2] - pz;
                float d = dx * dx + dy * dy + dz * dz;
                if (d < mind[i]) mind[i] = d;
                if (mind[i] > lbest) { lbest = mind[i]; lbesti = i; }
            }
#pragma omp critical
            { if (lbest > best) { best = lbest; besti = lbesti; } }
        }
#else
        for (int64_t i = 0; i < n; ++i) {
            float dx = points[3 * i] - px, dy = points[3 * i + 1] - py,
                  dz = points[3 * i + 2] - pz;
            float d = dx * dx + dy * dy + dz * dz;
            if (d < mind[i]) mind[i] = d;
            if (mind[i] > best) { best = mind[i]; besti = i; }
        }
#endif
        cur = besti;
    }
    delete[] mind;
}

}  // extern "C"
