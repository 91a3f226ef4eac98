"""Round-4 A/B: decoder-block megakernel (o+gate/up+down in ONE pallas
call, kernels/omlp_matvec.py) vs the round-3 split fused kernels.

Numerics: one-step logits compare (expected: bf16-rounding-level diffs —
x1 carried in f32, h quantized per-tile instead of per-token).
Timing: 256-step B=1 decode, llama3-8b + llama2-7b.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import omlp_matvec as om
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized,
                                                init_kv_cache)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode

STEPS = 256


def one_step_logits(model):
    graphdef, state = nnx.split(model)

    @jax.jit
    def step(state, caches, token):
        m = nnx.merge(graphdef, state)
        from neural_compressor_tpu.quantization.fuse import s4_prepare
        s4_prepare(m)
        logits, _ = m(token, positions=jnp.full((1, 1), 5, jnp.int32),
                      caches=caches, cache_pos=5)
        return logits

    caches = init_kv_cache(model.cfg, 1, 128)
    out = step(state, caches, jnp.zeros((1, 1), jnp.int32))
    return np.asarray(out, np.float32)


def measure(model, label):
    state, make_caches, decode = build_decode(model, 1, 1024)
    tok = jnp.zeros((1, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    compile_s = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.time()
        _, _, acc = decode(state, make_caches(), tok, STEPS)
        _ = np.asarray(acc)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    ms = best / STEPS * 1e3
    print(f"{label:44s} {ms:7.2f} ms/step  {STEPS/best:7.1f} tok/s"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return STEPS / best


def run(preset):
    print(f"=== {preset} ===", flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS[preset]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    enable_fused_decode(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)

    om.set_omlp_fused(False)
    la = one_step_logits(qmodel)
    om.set_omlp_fused(True)
    lb = one_step_logits(qmodel)
    rel = np.max(np.abs(la - lb)) / (np.max(np.abs(la)) + 1e-9)
    print(f"one-step logits max-rel diff split vs omlp: {rel:.2e}",
          flush=True)

    om.set_omlp_fused(False)
    a = measure(qmodel, f"{preset} split fused kernels (r3)")
    om.set_omlp_fused(True)
    b = measure(qmodel, f"{preset} o+mlp megakernel")
    print(f"omlp speedup: {b/a:.3f}x", flush=True)
    del qmodel


def main():
    print("device:", jax.devices(), flush=True)
    for preset in ("llama3-8b", "llama2-7b"):
        run(preset)


if __name__ == "__main__":
    main()
