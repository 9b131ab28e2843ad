// gridgcn_tpu native host runtime: threaded batch assembly + point sampling.
//
// The reference framework's native tier has two halves: CUDA kernels for the
// grid query (rebuilt as the XLA/Pallas compute path in gridgcn_tpu/ops) and
// C++ glue + a host-side data iterator feeding the device (SURVEY.md §2.1
// F-06, §2.3 F-11..F-13). This file is the TPU-native equivalent of the
// latter: it assembles training batches (row gathers from the memory-mapped
// dataset into a contiguous staging buffer) and draws per-cloud point
// subsamples on the host, multithreaded, so the Python feeder never becomes
// the bottleneck the reference's single-threaded iterator was (SURVEY §3.1
// "data iterator is a host-side bottleneck").
//
// Exposed as a plain C ABI consumed via ctypes (gridgcn_tpu/data/native.py);
// falls back to NumPy transparently when the shared library is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) across up to `threads` workers.
template <typename F>
void parallel_for(int64_t n, int threads, F fn) {
  if (threads <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&] {
    while (true) {
      int64_t i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n) return;
      fn(i);
    }
  };
  int nt = static_cast<int>(std::min<int64_t>(threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Gather `n` rows of `row_bytes` bytes each from `src` (row i = idx[i]) into
// the contiguous `out` buffer. This is the batch-assembly hot loop: one call
// builds one [B, N, C] batch from a [S, N, C] dataset.
void gg_gather_rows(const void* src, const int32_t* idx, int64_t n,
                    int64_t row_bytes, void* out, int threads) {
  const char* s = static_cast<const char*>(src);
  char* o = static_cast<char*>(out);
  parallel_for(n, threads, [&](int64_t i) {
    std::memcpy(o + i * row_bytes,
                s + static_cast<int64_t>(idx[i]) * row_bytes, row_bytes);
  });
}

// Per-cloud point subsampling: for each of the `b` output clouds, copy
// `n_out` of the `n_in` points of source cloud idx[i] (random subset without
// replacement when n_out <= n_in, with replacement otherwise), interleaved
// feature layout [n, c] float32. Seeded => reproducible across runs.
void gg_sample_points_f32(const float* src, const int32_t* idx, int64_t b,
                          int64_t n_in, int64_t n_out, int64_t c,
                          uint64_t seed, float* out, int threads) {
  parallel_for(b, threads, [&](int64_t i) {
    std::mt19937_64 rng(seed + 0x9e3779b97f4a7c15ull * (i + 1));
    const float* cloud = src + static_cast<int64_t>(idx[i]) * n_in * c;
    float* dst = out + i * n_out * c;
    if (n_out <= n_in) {
      // partial Fisher-Yates over an index vector
      std::vector<int32_t> perm(n_in);
      for (int64_t j = 0; j < n_in; ++j) perm[j] = static_cast<int32_t>(j);
      for (int64_t j = 0; j < n_out; ++j) {
        std::uniform_int_distribution<int64_t> d(j, n_in - 1);
        std::swap(perm[j], perm[d(rng)]);
        std::memcpy(dst + j * c, cloud + perm[j] * c, c * sizeof(float));
      }
    } else {
      std::uniform_int_distribution<int64_t> d(0, n_in - 1);
      for (int64_t j = 0; j < n_out; ++j) {
        std::memcpy(dst + j * c, cloud + d(rng) * c, c * sizeof(float));
      }
    }
  });
}

// Histogram labels into a [num_classes] int64 count vector (used for class
// weighting in segmentation training); -1 labels are ignored.
void gg_label_histogram(const int32_t* labels, int64_t n, int32_t num_classes,
                        int64_t* out) {
  std::memset(out, 0, sizeof(int64_t) * num_classes);
  for (int64_t i = 0; i < n; ++i) {
    int32_t l = labels[i];
    if (l >= 0 && l < num_classes) ++out[l];
  }
}

int gg_version() { return 1; }

}  // extern "C"
