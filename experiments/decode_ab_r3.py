"""Round-3 decode A/B on the chip (llama2-7b int4 u4k fused path):
  A. fused decode, norms folded in-kernel (current default)
  B. fused decode, norms in XLA (are the f32[4096] staging copies the
     cost, or the XLA norm ops?)
  C. A + int8 KV cache (halved attention reads vs bf16 cache)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode

STEPS = 256


def measure(model, label, quant_kv=False):
    state, make_caches, decode = build_decode(model, 1, 1024, quant_kv)
    tok = jnp.zeros((1, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    compile_s = time.time() - t0
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, STEPS)
    _ = np.asarray(acc)
    dt = time.time() - t0
    ms = dt / STEPS * 1e3
    print(f"{label:40s} {ms:7.2f} ms/step  {STEPS/dt:7.1f} tok/s"
          f"  (compile {compile_s:.0f}s)", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    enable_fused_decode(qmodel, fold_norms=True)
    measure(qmodel, "A fused + fold_norms")
    measure(qmodel, "C fused + fold_norms + int8 KV", quant_kv=True)
    enable_fused_decode(qmodel, fold_norms=False)
    measure(qmodel, "B fused, norms in XLA")


if __name__ == "__main__":
    main()
