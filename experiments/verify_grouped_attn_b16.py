"""Verify the grouped code-domain attention at B=16 (int4 fused, int8-KV).

Before (dequant + repeat): 31.4 ms/step (509 tok/s, PERF_NOTES). The
grouped path attends on cache codes directly; expect ~19 ms.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import decode_attention as da
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import fuse_for_serving
from decode_ab import build_decode

STEPS = 64


def run(batch, quant_kv):
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128))
    fuse_for_serving(qmodel)
    da.set_decode_attn_impl("xla")
    state, make_caches, decode = build_decode(qmodel, batch, 1024,
                                              quant_kv=quant_kv)
    tok = jnp.zeros((batch, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    print(f"B={batch} quant_kv={quant_kv} compile {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, STEPS)
    _ = np.asarray(acc)
    wall = time.time() - t0
    print(f"B={batch} quant_kv={quant_kv}: {wall/STEPS*1e3:.2f} ms/step "
          f"({batch*STEPS/wall:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    run(16, True)
    run(16, False)
