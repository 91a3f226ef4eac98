"""Round-4: paged attention v2 A/B on the chip. Full-model paged decode
(llama2-7b W4A8, int8 pool, pages of 128) v1 vs v2 vs contiguous at
B in {1, 8}. VERDICT #2 target: paged B=8 within ~15% of contiguous.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import paged_attention as pa
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized,
                                                init_paged_pool)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode

STEPS = 64
T = 1024
PAGE = 128


def build_paged_decode(model, batch, quantized="int8"):
    import functools

    from neural_compressor_tpu.quantization.fuse import s4_prepare

    graphdef, state = nnx.split(model)
    pmax = T // PAGE
    n_pages = batch * pmax + 1

    def make():
        pools = init_paged_pool(model.cfg, n_pages, batch, T,
                                page_size=PAGE, quantized=quantized)
        # slot i owns pages [1 + i*pmax, ...) — fully allocated
        bt = (1 + np.arange(batch * pmax).reshape(batch, pmax)
              ).astype(np.int32)
        pools = [p._replace(block_tables=jnp.asarray(bt)) for p in pools]
        return pools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode(state, pools, token, steps):
        m = nnx.merge(graphdef, state)
        s4_prepare(m)

        def body(i, carry):
            token, pools, acc = carry
            pos = jnp.full((batch,), T - STEPS - 2 + i, jnp.int32)
            logits, pools = m(token, positions=pos[:, None],
                              caches=pools, cache_pos=pos)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(token.dtype)
            return nxt, pools, acc + logits[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, steps, body,
                                 (token, pools, jnp.float32(0)))

    return state, make, decode


def run(state, make, decode, batch):
    tok = jnp.zeros((batch, 1), jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make(), tok, 4)
    _ = np.asarray(acc)
    cs = time.time() - t0
    t0 = time.time()
    _, _, acc = decode(state, make(), tok, STEPS)
    _ = np.asarray(acc)
    dt = time.time() - t0
    return dt / STEPS * 1e3, batch * STEPS / dt, cs


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)

    batches = tuple(int(a) for a in sys.argv[1:] if a.isdigit()) or (1, 8)
    for batch in batches:
        # contiguous int8-KV reference
        try:
            st, mk, dec = build_decode(qmodel, batch, T, quant_kv=True)
            tok = jnp.zeros((batch, 1), jnp.int32)
            _, _, a = dec(st, mk(), tok, 4); _ = np.asarray(a)
            t0 = time.time()
            _, _, a = dec(st, mk(), tok, STEPS); _ = np.asarray(a)
            dt = time.time() - t0
            print(f"B={batch} contiguous   {dt/STEPS*1e3:7.2f} ms/step "
                  f"{batch*STEPS/dt:7.1f} tok/s", flush=True)
        except Exception as e:
            print(f"B={batch} contiguous FAILED {type(e).__name__}: {e}",
                  flush=True)
        for v2, qfmt in ((False, "int8"), (True, "int8"), (True, "int4")):
            pa.set_paged_v2(v2)
            label = ("paged-v2-" + qfmt) if v2 else "paged-v1"
            try:
                st, mk, dec = build_paged_decode(qmodel, batch,
                                                 quantized=qfmt)
                ms, tps, cs = run(st, mk, dec, batch)
                print(f"B={batch} {label:14s} {ms:7.2f} ms/step "
                      f"{tps:7.1f} tok/s (compile {cs:.0f}s)", flush=True)
            except Exception as e:
                print(f"B={batch} {label} FAILED {type(e).__name__}: {e}",
                      flush=True)
        pa.set_paged_v2(True)


if __name__ == "__main__":
    main()
