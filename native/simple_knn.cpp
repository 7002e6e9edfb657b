// Mean squared distance to the k nearest neighbors — native init-time path.
//
// TPU-framework equivalent of the reference's simple-knn CUDA extension
// (submodules/simple-knn/simple_knn.cu:185-221, used once per training run to
// seed initial Gaussian scales, method.py:1001-1002). Same algorithm family:
// 10-bit Morton codes over the normalized bounding box, a radix-style sort,
// and a windowed nearest-neighbor search over the Morton order. Runs
// multithreaded on the host CPU (std::thread; no GPU needed at init time).
//
// Exposed C ABI (ctypes):
//   void mean_knn_dist2(const float* pts, long n, int window, int k, float* out)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <limits>
#include <thread>
#include <vector>

namespace {

inline uint32_t expand_bits_10(uint32_t v) {
    v &= 0x3FF;
    v = (v | (v << 16)) & 0x030000FF;
    v = (v | (v << 8)) & 0x0300F00F;
    v = (v | (v << 4)) & 0x030C30C3;
    v = (v | (v << 2)) & 0x09249249;
    return v;
}

void parallel_for(long n, const std::function<void(long, long)>& fn) {
    unsigned hw = std::max(1u, std::thread::hardware_concurrency());
    long chunk = (n + hw - 1) / hw;
    std::vector<std::thread> threads;
    for (unsigned t = 0; t < hw; ++t) {
        long lo = t * chunk;
        long hi = std::min<long>(n, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back(fn, lo, hi);
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" void mean_knn_dist2(const float* pts, long n, int window, int k,
                               float* out) {
    if (n <= 0) return;
    if (n == 1) { out[0] = 0.0f; return; }

    float mn[3] = {pts[0], pts[1], pts[2]};
    float mx[3] = {pts[0], pts[1], pts[2]};
    for (long i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            mn[d] = std::min(mn[d], pts[3 * i + d]);
            mx[d] = std::max(mx[d], pts[3 * i + d]);
        }
    }
    float inv[3];
    for (int d = 0; d < 3; ++d) {
        float range = mx[d] - mn[d];
        inv[d] = range > 1e-12f ? 1023.0f / range : 0.0f;
    }

    std::vector<std::pair<uint32_t, int32_t>> order(n);
    parallel_for(n, [&](long lo, long hi) {
        for (long i = lo; i < hi; ++i) {
            uint32_t code = 0;
            for (int d = 0; d < 3; ++d) {
                uint32_t q = (uint32_t)std::min(
                    1023.0f, std::max(0.0f, (pts[3 * i + d] - mn[d]) * inv[d]));
                code |= expand_bits_10(q) << d;
            }
            order[i] = {code, (int32_t)i};
        }
    });
    std::sort(order.begin(), order.end());

    std::vector<float> sorted(3 * n);
    for (long i = 0; i < n; ++i) {
        std::memcpy(&sorted[3 * i], &pts[3 * order[i].second], 3 * sizeof(float));
    }

    int kk = std::min<long>(k, n - 1);
    parallel_for(n, [&](long lo, long hi) {
        std::vector<float> best(kk);
        for (long i = lo; i < hi; ++i) {
            for (int j = 0; j < kk; ++j) best[j] = std::numeric_limits<float>::max();
            long w0 = std::max<long>(0, i - window);
            long w1 = std::min<long>(n, i + window + 1);
            const float* pi = &sorted[3 * i];
            for (long j = w0; j < w1; ++j) {
                if (j == i) continue;
                const float* pj = &sorted[3 * j];
                float dx = pi[0] - pj[0], dy = pi[1] - pj[1], dz = pi[2] - pj[2];
                float d2 = dx * dx + dy * dy + dz * dz;
                if (d2 < best[kk - 1]) {
                    // insertion into the tiny sorted best-list
                    int p = kk - 1;
                    while (p > 0 && best[p - 1] > d2) { best[p] = best[p - 1]; --p; }
                    best[p] = d2;
                }
            }
            float sum = 0;
            for (int j = 0; j < kk; ++j) sum += best[j];
            out[order[i].second] = sum / kk;
        }
    });
}
