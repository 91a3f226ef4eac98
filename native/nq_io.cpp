// nq_io — native checkpoint IO for the streaming (layer-wise) path.
//
// Replaces the reference's per-tensor torch.load/pickle hot path
// (neural_compressor/torch/algorithms/layer_wise/utils.py:266-434) with a
// TPU-host-native design: safetensors shards are mmap'ed once, the NEXT
// layer's tensors are prefetched (page-in) on a background thread while
// the TPU quantizes the current layer, and bf16/f16 -> f32 widening runs
// multi-threaded straight out of the page cache into the destination
// buffer (numpy's view().astype() path is single-threaded).
//
// Header parsing (JSON) stays in Python; this layer only moves bytes.
// Plain C ABI for ctypes.

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <functional>
#include <mutex>
#include <chrono>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Mapping {
  void* base = nullptr;
  size_t len = 0;
};

std::mutex g_mu;
std::unordered_map<int64_t, Mapping> g_maps;
int64_t g_next_handle = 1;
std::atomic<int64_t> g_inflight_prefetch{0};

void io_parallel_for(int64_t n, int64_t grain,
                     const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t n_threads = std::min<int64_t>(hw, (n + grain - 1) / grain);
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

const uint8_t* region(int64_t handle, int64_t off, int64_t nbytes) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_maps.find(handle);
  if (it == g_maps.end()) return nullptr;
  if (off < 0 || nbytes < 0 ||
      static_cast<size_t>(off + nbytes) > it->second.len)
    return nullptr;
  return static_cast<const uint8_t*>(it->second.base) + off;
}

inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) {
        man <<= 1;
        ++shift;
      }
      man &= 0x3ff;
      bits = sign | ((127 - 14 - shift) << 23) | (man << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000u | (man << 13);
  } else {
    bits = sign | ((exp + 127 - 15) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

}  // namespace

extern "C" {

// Open + mmap a file read-only. Returns a handle > 0, or -errno.
int64_t io_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return -2;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);  // mapping keeps the file alive
  if (base == MAP_FAILED) return -3;
  ::madvise(base, st.st_size, MADV_SEQUENTIAL);
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t h = g_next_handle++;
  g_maps[h] = {base, static_cast<size_t>(st.st_size)};
  return h;
}

void io_close(int64_t handle) {
  // detached prefetch touchers read the mapping; unmapping under them is
  // a use-after-munmap SIGSEGV — drain them first (they finish in ms)
  for (int spins = 0; g_inflight_prefetch.load() > 0 && spins < 20000;
       ++spins)
    std::this_thread::sleep_for(std::chrono::microseconds(100));
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_maps.find(handle);
  if (it == g_maps.end()) return;
  ::munmap(it->second.base, it->second.len);
  g_maps.erase(it);
}

// Asynchronously page-in [off, off+nbytes): madvise(WILLNEED) + a detached
// toucher thread (one read per page guarantees residency even when the
// kernel ignores the advice). Returns immediately.
void io_prefetch(int64_t handle, int64_t off, int64_t nbytes) {
  const uint8_t* p = region(handle, off, nbytes);
  if (p == nullptr || nbytes == 0) return;
  // align to page for madvise
  uintptr_t a = reinterpret_cast<uintptr_t>(p);
  uintptr_t a0 = a & ~static_cast<uintptr_t>(4095);
  ::madvise(reinterpret_cast<void*>(a0), (a - a0) + nbytes, MADV_WILLNEED);
  g_inflight_prefetch.fetch_add(1);
  std::thread([p, nbytes] {
    volatile uint8_t sink = 0;
    for (int64_t i = 0; i < nbytes; i += 4096) sink ^= p[i];
    (void)sink;
    g_inflight_prefetch.fetch_sub(1);
  }).detach();
}

int64_t io_prefetch_inflight() { return g_inflight_prefetch.load(); }

// Parallel copy of raw bytes out of the mapping. Returns 0 on success.
int io_read_bytes(int64_t handle, int64_t off, int64_t nbytes, void* out) {
  const uint8_t* p = region(handle, off, nbytes);
  if (p == nullptr) return -1;
  uint8_t* dst = static_cast<uint8_t*>(out);
  io_parallel_for(nbytes, 16 << 20, [&](int64_t lo, int64_t hi) {
    std::memcpy(dst + lo, p + lo, hi - lo);
  });
  return 0;
}

// Widen n bf16 values (raw uint16 LE) at `off` into float32 `out`.
int io_read_bf16_as_f32(int64_t handle, int64_t off, int64_t n, float* out) {
  const uint8_t* p = region(handle, off, n * 2);
  if (p == nullptr) return -1;
  const uint16_t* src = reinterpret_cast<const uint16_t*>(p);
  uint32_t* dst = reinterpret_cast<uint32_t*>(out);
  io_parallel_for(n, 4 << 20, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      dst[i] = static_cast<uint32_t>(src[i]) << 16;
  });
  return 0;
}

// Widen n IEEE f16 values at `off` into float32 `out`.
int io_read_f16_as_f32(int64_t handle, int64_t off, int64_t n, float* out) {
  const uint8_t* p = region(handle, off, n * 2);
  if (p == nullptr) return -1;
  const uint16_t* src = reinterpret_cast<const uint16_t*>(p);
  io_parallel_for(n, 4 << 20, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = f16_to_f32(src[i]);
  });
  return 0;
}

}  // extern "C"
