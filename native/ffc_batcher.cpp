// Native batch-assembly engine for the data loader.
//
// The reference delegates its hot data path to torch's C++ DataLoader
// workers (pin_memory, num_workers=8 — reference util/data_loader.py).
// This is the equivalent native component for the TPU framework: a
// multithreaded gather + uint8->float32 normalise ((x/127.5)-1) +
// optional horizontal flip over a contiguous uint8 image store, exposed
// through a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: see native/Makefile (g++ -O3 -shared -pthread).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Job {
  const uint8_t* images;  // (N, H, W, C) contiguous
  const int64_t* indices; // (B,)
  float* out;             // (B, H, W, C)
  int64_t h, w, c;
  int hflip;              // flip each gathered image horizontally
};

inline void normalize_row(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kScale = 1.0f / 127.5f;
  for (int64_t i = 0; i < n; ++i) {
    dst[i] = static_cast<float>(src[i]) * kScale - 1.0f;
  }
}

void process_range(const Job& job, int64_t begin, int64_t end) {
  const int64_t hwc = job.h * job.w * job.c;
  const int64_t wc = job.w * job.c;
  for (int64_t b = begin; b < end; ++b) {
    const uint8_t* src = job.images + job.indices[b] * hwc;
    float* dst = job.out + b * hwc;
    if (!job.hflip) {
      normalize_row(src, dst, hwc);
    } else {
      for (int64_t y = 0; y < job.h; ++y) {
        const uint8_t* srow = src + y * wc;
        float* drow = dst + y * wc;
        for (int64_t x = 0; x < job.w; ++x) {
          const uint8_t* spix = srow + (job.w - 1 - x) * job.c;
          float* dpix = drow + x * job.c;
          for (int64_t ch = 0; ch < job.c; ++ch) {
            dpix[ch] = static_cast<float>(spix[ch]) * (1.0f / 127.5f) - 1.0f;
          }
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Gather `batch` images by index from a contiguous uint8 store and write
// normalised float32 NHWC output. `n_threads <= 0` uses the hardware
// concurrency.
void ffc_gather_normalize(const uint8_t* images, const int64_t* indices,
                          int64_t batch, int64_t h, int64_t w, int64_t c,
                          float* out, int hflip, int n_threads) {
  Job job{images, indices, out, h, w, c, hflip};
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int threads = n_threads > 0 ? n_threads : (hw > 0 ? hw : 4);
  if (threads > batch) threads = static_cast<int>(batch);
  if (threads <= 1) {
    process_range(job, 0, batch);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t chunk = (batch + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = begin + chunk < batch ? begin + chunk : batch;
    if (begin >= end) break;
    pool.emplace_back([&job, begin, end] { process_range(job, begin, end); });
  }
  for (auto& th : pool) th.join();
}

// In-place Fisher-Yates shuffle of an int64 index array with an xorshift
// PRNG — the loader's epoch permutation without the GIL.
void ffc_shuffle_indices(int64_t* indices, int64_t n, uint64_t seed) {
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
  auto next = [&s]() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  };
  for (int64_t i = n - 1; i > 0; --i) {
    const int64_t j = static_cast<int64_t>(next() % static_cast<uint64_t>(i + 1));
    const int64_t tmp = indices[i];
    indices[i] = indices[j];
    indices[j] = tmp;
  }
}

// uint8 -> float32 normalise of a flat buffer (no gather), parallel.
void ffc_normalize_u8(const uint8_t* src, float* dst, int64_t n,
                      int n_threads) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int threads = n_threads > 0 ? n_threads : (hw > 0 ? hw : 4);
  const int64_t min_chunk = 1 << 16;
  if (n < min_chunk * 2 || threads <= 1) {
    normalize_row(src, dst, n);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t begin = static_cast<int64_t>(t) * chunk;
    const int64_t end = begin + chunk < n ? begin + chunk : n;
    if (begin >= end) break;
    pool.emplace_back(
        [src, dst, begin, end] { normalize_row(src + begin, dst + begin, end - begin); });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
