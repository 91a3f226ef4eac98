"""Verify the large-tk tile selection for awkward K (11008): M=16 decode
shapes and M=2048 prefill, plus full-model B=16 with threshold 16.
Before: K=11008 ran 89 GB/s (tk=256, grid-overhead bound)."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.ops.qtensor import quantize_tensor
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode


def bench(K, N, M, iters):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=128,
                                      scheme="sym"))
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    @jax.jit
    def run(x, iters):
        def body(i, x):
            y = w4a8_matmul(x, pw)
            return (y[:, :K] if N >= K else
                    jnp.tile(y, (1, K // N + 1))[:, :K]).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    _ = np.asarray(run(x, 2).ravel()[0])
    t0 = time.time()
    _ = np.asarray(run(x, iters).ravel()[0])
    us = (time.time() - t0) / iters * 1e6
    gbs = (K * N / 2) / us / 1e3
    tfs = 2 * M * N * K / us / 1e6
    print(f"M={M} K={K} N={N}: {us:8.1f} us/call ({gbs:5.0f} GB/s, "
          f"{tfs:6.1f} TF/s)", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    bench(11008, 4096, 16, 2000)
    bench(4096, 4096, 16, 2000)
    bench(11008, 4096, 2048, 100)
    bench(4096, 4096, 2048, 100)

    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    state, make_caches, decode = build_decode(qmodel, 16, 1024,
                                              quant_kv=True)
    tok = jnp.zeros((16, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    print(f"B=16 compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 64)
    _ = np.asarray(acc)
    wall = time.time() - t0
    print(f"B=16: {wall/64*1e3:.2f} ms/step ({16*64/wall:.1f} tok/s)",
          flush=True)


if __name__ == "__main__":
    main()
