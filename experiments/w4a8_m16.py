"""Does the int8-MXU w4a8 kernel beat the bf16 MXU-dequant kernel at
M=16 (batched decode)? Profile showed B=16 matmuls run at 5.0e11 el/s via
dequant-into-MXU; the int8 MXU path could stream codes faster.

Microbench the serving shapes at M=16, then the full model at B=16 with
W4A8Linear.M_INT8_THRESHOLD dropped to 16.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels.dequant_matmul import woq_matmul
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
from neural_compressor_tpu.layers.woq_linear import W4A8Linear
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.ops.qtensor import quantize_tensor
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode

M = 16
ITERS = 2000


def bench_shape(K, N):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=128,
                                      scheme="sym"))
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    def chain(fn, label):
        @jax.jit
        def run(x, iters):
            def body(i, x):
                y = fn(x, pw)
                # feed output back (data dependency); reshape to [M, K]
                return (y[:, :K] if N >= K else
                        jnp.tile(y, (1, K // N + 1))[:, :K]).astype(x.dtype)
            return jax.lax.fori_loop(0, iters, body, x)

        _ = np.asarray(run(x, 2).ravel()[0])
        t0 = time.time()
        _ = np.asarray(run(x, ITERS).ravel()[0])
        us = (time.time() - t0) / ITERS * 1e6
        gbs = (K * N / 2) / us / 1e3
        print(f"  {label:10s} K={K} N={N}: {us:7.1f} us/call "
              f"({gbs:5.0f} GB/s eff)", flush=True)
        return us

    bench_shape_pallas = chain(lambda x, pw: woq_matmul(x, pw, impl="pallas"),
                               "pallas")
    bench_shape_w4a8 = chain(lambda x, pw: w4a8_matmul(x, pw), "w4a8")
    return bench_shape_pallas, bench_shape_w4a8


def main():
    print("device:", jax.devices(), flush=True)
    for K, N in ((4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)):
        bench_shape(K, N)

    # full model A/B at B=16
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    for thresh in (64, 16):
        W4A8Linear.M_INT8_THRESHOLD = thresh
        state, make_caches, decode = build_decode(qmodel, 16, 1024,
                                                  quant_kv=True)
        tok = jnp.zeros((16, 1), dtype=jnp.int32)
        t0 = time.time()
        _, _, acc = decode(state, make_caches(), tok, 4)
        _ = np.asarray(acc)
        print(f"thresh={thresh} compile {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        _, _, acc = decode(state, make_caches(), tok, 64)
        _ = np.asarray(acc)
        wall = time.time() - t0
        print(f"thresh={thresh} B=16: {wall/64*1e3:.2f} ms/step "
              f"({16*64/wall:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
