"""Full-model decode A/B on the real chip: MXU kernel vs VPU matvec vs
qkv/gate-up fusion, on llama2-7b int4 g128 (B=1).

Also measures the int8-KV cache in both write modes (aliased in-kernel
write-back vs read-only kernel + outside DUS) at T=1024.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, "/root/repo")

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import dequant_matmul
from neural_compressor_tpu.kernels import decode_attention as da
from neural_compressor_tpu.models.llama import (
    LLAMA_PRESETS, LlamaConfig, build_quantized, init_kv_cache)
from neural_compressor_tpu.quantization.fuse import fuse_for_serving

PRESET = "llama2-7b"
STEPS = 256
MAX_LEN = 1024


def build_decode(model, batch, max_len, quant_kv=False):
    def make_caches():
        fmt = quant_kv if isinstance(quant_kv, str) else (
            "int8" if quant_kv else False)
        return init_kv_cache(model.cfg, batch, max_len, quantized=fmt)

    graphdef, state = nnx.split(model)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode(state, caches, token, steps):
        m = nnx.merge(graphdef, state)
        from neural_compressor_tpu.quantization.fuse import s4_prepare
        s4_prepare(m)

        def body(i, carry):
            token, caches, acc = carry
            positions = jnp.full((batch, 1), i, dtype=jnp.int32)
            logits, caches = m(token, positions=positions, caches=caches,
                               cache_pos=i)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(token.dtype)
            return nxt, caches, acc + logits[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, steps, body,
                                 (token, caches, jnp.float32(0)))

    return state, make_caches, decode


def measure(model, label, batch=1, quant_kv=False, steps=STEPS):
    state, make_caches, decode = build_decode(model, batch, MAX_LEN, quant_kv)
    tok = jnp.zeros((batch, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    compile_s = time.time() - t0
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, steps)
    _ = np.asarray(acc)
    dt = time.time() - t0
    ms = dt / steps * 1e3
    print(f"{label:34s} {ms:7.2f} ms/step  {batch * steps / dt:7.1f} tok/s"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    print(f"device: {jax.devices()}", flush=True)
    t0 = time.time()
    qmodel = build_quantized(LlamaConfig(**LLAMA_PRESETS[PRESET]),
                             nq.RTNConfig(dtype="int4", group_size=128))
    print(f"build+quantize {time.time() - t0:.0f}s", flush=True)

    dequant_matmul.set_default_impl("pallas")
    measure(qmodel, "mxu-kernel B=1")
    dequant_matmul.set_default_impl("vpu")
    measure(qmodel, "vpu-matvec B=1")

    n = fuse_for_serving(qmodel)
    print(f"fused {n} projection groups", flush=True)
    measure(qmodel, "fused + vpu B=1")
    dequant_matmul.set_default_impl("pallas")
    measure(qmodel, "fused + mxu B=1")
    dequant_matmul.set_default_impl("auto")
    measure(qmodel, "fused + auto B=8", batch=8)

    # int8-KV write modes (fused model, auto impl)
    da.set_cache_write_mode("kernel")
    measure(qmodel, "int8-kv kernel-writeback B=1", quant_kv=True)
    da.set_cache_write_mode("outside")
    measure(qmodel, "int8-kv outside-DUS B=1", quant_kv=True)


if __name__ == "__main__":
    main()
