// nq_native — host-side native kernels for the TPU quantization engine.
//
// Replaces the reference's numba-JIT bit packers
// (neural_compressor/torch/utils/bit_packer.py:25-278) and the hot host
// paths of checkpoint interchange (optimum/GPTQ layout conversion,
// weight_only/modules.py:195-268) with multi-threaded C++.
//
// Layouts:
//  * tpu_strided: int codes [K, N] packed into uint32 lanes along K,
//    fields stored OFFSET-BINARY (signed + 2^(bits-1)); within
//    each group of G rows, lane-row i field s holds original row s*(G/P)+i
//    (P = 32/bits). Matches ops/packing.py exactly.
//  * gptq (optimum/AutoGPTQ): qweight int32 [K/P, N], word i field s = row
//    i*P+s; qzeros stores (zero-1) packed along N.
//
// Exposed as a plain C ABI for ctypes. All functions are thread-parallel
// over the N (column) axis.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>
#include <functional>

namespace {

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t n_threads = std::min<int64_t>(hw, n);
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

}  // namespace

extern "C" {

// codes: int8 [K, N] (two's-complement low `bits`), out: uint32 [K/P, N].
// Requires K % G == 0 and G % P == 0 (validated by the Python wrapper).
void pack_tpu_strided(const int8_t* codes, uint32_t* out, int64_t K,
                      int64_t N, int bits, int G, int offset_binary) {
  const int P = 32 / bits;
  const int64_t rpg = G / P;       // packed rows per group
  const int64_t ng = K / G;
  const uint32_t mask = (1u << bits) - 1u;
  parallel_for(N, [&](int64_t n0, int64_t n1) {
    for (int64_t g = 0; g < ng; ++g) {
      for (int64_t i = 0; i < rpg; ++i) {
        uint32_t* dst = out + (g * rpg + i) * N;
        for (int64_t n = n0; n < n1; ++n) {
          uint32_t word = 0;
          for (int s = 0; s < P; ++s) {
            int64_t row = g * G + s * rpg + i;
            uint32_t fieldv = static_cast<uint32_t>(
                                  static_cast<uint8_t>(codes[row * N + n])) &
                              mask;
            // offset-binary: xor the sign bit of the two's-complement field
            if (offset_binary) fieldv ^= (1u << (bits - 1));
            word |= fieldv << (bits * s);
          }
          dst[n] = word;
        }
      }
    }
  });
}

// Inverse: uint32 [K/P, N] -> int8 codes [K, N]; signed sign-extends.
void unpack_tpu_strided(const uint32_t* packed, int8_t* out, int64_t K,
                        int64_t N, int bits, int G, int is_signed) {
  const int P = 32 / bits;
  const int64_t rpg = G / P;
  const int64_t ng = K / G;
  const uint32_t mask = (1u << bits) - 1u;
  const int32_t half = 1 << (bits - 1);
  parallel_for(N, [&](int64_t n0, int64_t n1) {
    for (int64_t g = 0; g < ng; ++g) {
      for (int64_t i = 0; i < rpg; ++i) {
        const uint32_t* src = packed + (g * rpg + i) * N;
        for (int64_t n = n0; n < n1; ++n) {
          uint32_t word = src[n];
          for (int s = 0; s < P; ++s) {
            int32_t v = static_cast<int32_t>((word >> (bits * s)) & mask);
            if (is_signed) v -= half;  // fields are offset-binary
            out[(g * G + s * rpg + i) * N + n] = static_cast<int8_t>(v);
          }
        }
      }
    }
  });
}

// codes int8 [K, N] (unsigned values 0..2^bits-1 expected after offset) ->
// optimum qweight int32 [K/P, N]: word i field s = row i*P+s.
void pack_gptq_qweight(const int8_t* codes, int32_t* out, int64_t K,
                       int64_t N, int bits) {
  const int P = 32 / bits;
  const int64_t words = K / P;
  const uint32_t mask = (1u << bits) - 1u;
  parallel_for(N, [&](int64_t n0, int64_t n1) {
    for (int64_t w = 0; w < words; ++w) {
      int32_t* dst = out + w * N;
      for (int64_t n = n0; n < n1; ++n) {
        uint32_t word = 0;
        for (int s = 0; s < P; ++s) {
          word |= (static_cast<uint32_t>(
                       static_cast<uint8_t>(codes[(w * P + s) * N + n])) &
                   mask)
                  << (bits * s);
        }
        dst[n] = static_cast<int32_t>(word);
      }
    }
  });
}

// optimum qweight int32 [K/P, N] -> unsigned codes int8 [K, N].
void unpack_gptq_qweight(const int32_t* qweight, int8_t* out, int64_t K,
                         int64_t N, int bits) {
  const int P = 32 / bits;
  const int64_t words = K / P;
  const uint32_t mask = (1u << bits) - 1u;
  parallel_for(N, [&](int64_t n0, int64_t n1) {
    for (int64_t w = 0; w < words; ++w) {
      const int32_t* src = qweight + w * N;
      for (int64_t n = n0; n < n1; ++n) {
        uint32_t word = static_cast<uint32_t>(src[n]);
        for (int s = 0; s < P; ++s) {
          out[(w * P + s) * N + n] =
              static_cast<int8_t>((word >> (bits * s)) & mask);
        }
      }
    }
  });
}

// Convert a gptq qweight directly to tpu_strided without materializing
// int8 codes (the checkpoint-import hot path). gptq raw unsigned == our
// offset-binary fields, so this is a pure re-stride.
void gptq_to_tpu_strided(const int32_t* qweight, uint32_t* out, int64_t K,
                         int64_t N, int bits, int G) {
  const int P = 32 / bits;
  const int64_t rpg = G / P;
  const int64_t ng = K / G;
  const uint32_t mask = (1u << bits) - 1u;
  const int32_t half = 1 << (bits - 1);
  parallel_for(N, [&](int64_t n0, int64_t n1) {
    for (int64_t g = 0; g < ng; ++g) {
      for (int64_t i = 0; i < rpg; ++i) {
        uint32_t* dst = out + (g * rpg + i) * N;
        for (int64_t n = n0; n < n1; ++n) {
          uint32_t word = 0;
          for (int s = 0; s < P; ++s) {
            int64_t row = g * G + s * rpg + i;
            uint32_t raw =
                (static_cast<uint32_t>(qweight[(row / P) * N + n]) >>
                 (bits * (row % P))) &
                mask;
            word |= raw << (bits * s);
          }
          dst[n] = word;
        }
      }
    }
  });
}

int nq_native_version() { return 2; }

}  // extern "C"
