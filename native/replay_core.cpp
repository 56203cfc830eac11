// Native replay-buffer core: batched zlib (de)compression and weighted
// sampling without replacement.
//
// TPU-native counterpart of the reference's host-side example machinery:
// per-example zlib compression (Coach.py:100, GenericNNetWrapper.py:326-341)
// and surprise-weighted minibatch sampling (GenericNNetWrapper.py:333-341).
// Compiled to a shared library and driven from Python via ctypes
// (alphazero_tpu/utils/native.py); the Python layer falls back to numpy/zlib
// when the library is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links -lz)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

#include <zlib.h>

extern "C" {

// Compress src[n] into dst[cap]; returns compressed size or -1.
long long rc_compress(const uint8_t* src, long long n, uint8_t* dst,
                      long long cap, int level) {
    uLongf dlen = static_cast<uLongf>(cap);
    int rc = compress2(dst, &dlen, src, static_cast<uLong>(n), level);
    if (rc != Z_OK) return -1;
    return static_cast<long long>(dlen);
}

// Decompress src[n] into dst[cap]; returns decompressed size or -1.
long long rc_decompress(const uint8_t* src, long long n, uint8_t* dst,
                        long long cap) {
    uLongf dlen = static_cast<uLongf>(cap);
    int rc = uncompress(dst, &dlen, src, static_cast<uLong>(n));
    if (rc != Z_OK) return -1;
    return static_cast<long long>(dlen);
}

// Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res):
// pick k of n indices with probability proportional to weights.
// out must hold k entries. Returns number sampled.
long long rc_sample_weighted(const float* weights, long long n, long long k,
                             uint64_t seed, uint32_t* out) {
    if (k > n) k = n;
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(1e-300, 1.0);
    using Item = std::pair<double, uint32_t>;   // (key, index), min-heap
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> heap;
    for (long long i = 0; i < n; ++i) {
        double w = weights[i] > 0 ? weights[i] : 1e-12;
        double key = std::pow(uni(rng), 1.0 / w);
        if (static_cast<long long>(heap.size()) < k) {
            heap.emplace(key, static_cast<uint32_t>(i));
        } else if (key > heap.top().first) {
            heap.pop();
            heap.emplace(key, static_cast<uint32_t>(i));
        }
    }
    long long m = 0;
    while (!heap.empty()) {
        out[m++] = heap.top().second;
        heap.pop();
    }
    return m;
}

// Uniform sampling without replacement (partial Fisher-Yates over an index
// permutation kept in a hash-free dense vector; O(n) setup avoided for
// n >> k by rejection when k is small relative to n).
long long rc_sample_uniform(long long n, long long k, uint64_t seed,
                            uint32_t* out) {
    if (k > n) k = n;
    std::mt19937_64 rng(seed);
    if (k * 20 < n) {   // sparse: rejection sampling
        std::vector<uint32_t> seen;
        seen.reserve(k * 2);
        long long m = 0;
        while (m < k) {
            uint32_t v = static_cast<uint32_t>(rng() % n);
            bool dup = false;
            for (long long j = 0; j < m; ++j)
                if (out[j] == v) { dup = true; break; }
            if (!dup) out[m++] = v;
        }
        return m;
    }
    std::vector<uint32_t> idx(n);
    for (long long i = 0; i < n; ++i) idx[i] = static_cast<uint32_t>(i);
    for (long long i = 0; i < k; ++i) {
        long long j = i + static_cast<long long>(rng() % (n - i));
        std::swap(idx[i], idx[j]);
        out[i] = idx[i];
    }
    return k;
}

}  // extern "C"
