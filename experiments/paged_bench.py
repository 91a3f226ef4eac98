"""Paged decode attention at 7B scale: step time vs contiguous caches.
llama2-7b int4 fused, T=1024 (8 pages x 128), B in {1, 8}.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, "/root/repo")

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (
    LLAMA_PRESETS, LlamaConfig, build_quantized, init_kv_cache,
    init_paged_pool)
from neural_compressor_tpu.quantization.fuse import fuse_for_serving

T = 1024
PAGE = 128
PMAX = T // PAGE


def measure_paged(model, batch, steps=64, quantized=False):
    pools = init_paged_pool(model.cfg, n_pages=batch * PMAX + 1, batch=batch,
                            max_len=T, page_size=PAGE, quantized=quantized)
    rng = np.random.default_rng(0)
    bt = np.zeros((batch, PMAX), np.int32)
    ids = rng.permutation(np.arange(1, batch * PMAX + 1))
    bt[:] = ids.reshape(batch, PMAX)
    # donation cannot alias one buffer into many pytree leaves: each
    # layer's pool gets its OWN block-table copy
    pools = [p._replace(block_tables=jnp.array(bt)) for p in pools]
    graphdef, state = nnx.split(model)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode(state, pools, token, steps):
        m = nnx.merge(graphdef, state)

        def body(i, carry):
            token, pools, acc = carry
            pos = jnp.full((batch,), 512 + (i % 256), jnp.int32)
            logits, pools = m(token, positions=pos[:, None], caches=pools,
                              cache_pos=pos)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(token.dtype)
            return nxt, pools, acc + logits[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, steps, body,
                                 (token, pools, jnp.float32(0)))

    tok = jnp.zeros((batch, 1), jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, pools, tok, 4)
    _ = np.asarray(acc)
    compile_s = time.time() - t0
    pools = init_paged_pool(model.cfg, n_pages=batch * PMAX + 1, batch=batch,
                            max_len=T, page_size=PAGE, quantized=quantized)
    pools = [p._replace(block_tables=jnp.array(bt)) for p in pools]
    t0 = time.time()
    _, _, acc = decode(state, pools, tok, steps)
    _ = np.asarray(acc)
    dt = time.time() - t0
    print(f"paged {'int8' if quantized else 'bf16'} B={batch}: "
          f"{dt/steps*1e3:7.2f} ms/step  {batch*steps/dt:7.1f} tok/s "
          f"(compile {compile_s:.0f}s)", flush=True)


def main():
    print(f"device: {jax.devices()}", flush=True)
    t0 = time.time()
    qmodel = build_quantized(LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
                             nq.RTNConfig(dtype="int4", group_size=128))
    fuse_for_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    measure_paged(qmodel, 1)
    measure_paged(qmodel, 8)
    measure_paged(qmodel, 8, quantized="int8")


if __name__ == "__main__":
    main()
