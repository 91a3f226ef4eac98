"""Round-4: bisect the generation-API slowdown (6 tok/s vs bench's 176).

bench.py's program (fori_loop over a merged+s4_prepare'd module) runs
176 tok/s; generation/_run's (prefill forward + lax.while_loop with EOS
early-exit over the same module) runs ~6 — the s4-view re-materialization
signature. Four programs on the same fused llama2-7b model isolate the
trigger:
  A. fori_loop only                     (bench shape — control)
  B. while_loop only                    (early-exit cond)
  C. prefill + fori_loop                (two consumers of the views)
  D. prefill + while_loop               (the _run shape)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized,
                                                init_kv_cache)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     s4_prepare,
                                                     to_w4a8_serving)

STEPS = 64
P = 32
T = 512


def build(model, prefill: bool, early_exit: bool):
    graphdef, state = nnx.split(model)

    @jax.jit
    def go(state, ids, caches):
        m = nnx.merge(graphdef, state)
        s4_prepare(m)
        if prefill:
            pos = jnp.broadcast_to(jnp.arange(P)[None], (1, P))
            logits, caches = m(ids, positions=pos, caches=caches,
                               cache_pos=0)
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        else:
            tok = ids[:, :1]

        def body_fn(i, tok, caches, acc):
            pos = jnp.full((1, 1), P + i, jnp.int32)
            logits, caches = m(tok, positions=pos, caches=caches,
                               cache_pos=P + i)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return nxt, caches, acc + logits[0, 0, 0].astype(jnp.float32)

        if early_exit:
            def cond(c):
                i, _t, _c, acc = c
                return (i < STEPS) & (acc < 1e30)

            def wbody(c):
                i, tok, caches, acc = c
                tok, caches, acc = body_fn(i, tok, caches, acc)
                return i + 1, tok, caches, acc

            _i, _t, _c, acc = jax.lax.while_loop(
                cond, wbody, (0, tok, caches, jnp.float32(0)))
        else:
            def fbody(i, c):
                tok, caches, acc = c
                return body_fn(i, tok, caches, acc)

            _t, _c, acc = jax.lax.fori_loop(
                0, STEPS, fbody, (tok, caches, jnp.float32(0)))
        return acc

    return go, state


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    m = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(m)
    to_w4a8_serving(m)
    enable_fused_decode(m)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    ids = jnp.zeros((1, P), jnp.int32)

    for label, prefill, early in (("A fori", False, False),
                                  ("B while", False, True),
                                  ("C prefill+fori", True, False),
                                  ("D prefill+while", True, True)):
        try:
            go, state = build(m, prefill, early)
            caches = init_kv_cache(m.cfg, 1, T)
            acc = go(state, ids, caches)
            _ = np.asarray(acc)
            t0 = time.time()
            acc = go(state, ids, init_kv_cache(m.cfg, 1, T))
            _ = np.asarray(acc)
            dt = (time.time() - t0) / STEPS
            print(f"{label:18s} {dt*1e3:8.2f} ms/tok  {1/dt:7.1f} tok/s",
                  flush=True)
        except Exception as e:
            print(f"{label:18s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
