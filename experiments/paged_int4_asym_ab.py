"""Round-5: asymmetric per-(token, head, D-half) int4 paged pool on chip.

The paged int4 pool carried the OLD symmetric per-token quantizer
(tiny_gqa +0.15 ppl — over budget) while the contiguous cache moved to
the affine form. This validates the reworked write/attention kernels on
real Mosaic and A/Bs the B in {1, 8, 16} decode step vs the round-4
numbers (int4 pool B=16 was 1186 tok/s): the affine math adds two
rank-1 corrections per dot — the streams are unchanged, so the cost
should be noise.

Also numerics: one decode step through the paged int4 path vs the
contiguous int4 (asym) path — both quantize with the same formula now,
so outputs should agree to online-softmax reassociation tolerance.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
from paged_v2_ab import build_paged_decode

STEPS = 64
T = 1024


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    m = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(m)
    to_w4a8_serving(m)
    print(f"build {time.time()-t0:.0f}s", flush=True)

    import itertools
    for B, fmt in itertools.product((1, 8, 16), ("int4", "int8")):
        try:
            st, mk, dec = build_paged_decode(m, B, quantized=fmt)
            tok = jnp.zeros((B, 1), jnp.int32)
            _, _, a = dec(st, mk(), tok, 4)
            _ = np.asarray(a)
            t0 = time.time()
            _, _, a = dec(st, mk(), tok, STEPS)
            _ = np.asarray(a)
            dt = (time.time() - t0) / STEPS
            print(f"B={B:3d} {fmt}-pool: {dt*1e3:6.2f} ms/step  "
                  f"{B/dt:7.1f} tok/s", flush=True)
        except Exception as e:
            print(f"B={B} {fmt} FAILED {type(e).__name__}: {e}",
                  flush=True)

    # numerics: paged int4 vs contiguous int4 (same asym quantizer) at a
    # real position; compare one decode logits vector
    from flax import nnx

    from neural_compressor_tpu.models.llama import init_kv_cache
    from neural_compressor_tpu.quantization.fuse import s4_prepare

    qm = nq.quantize(m, nq.KVCacheQuantConfig(dtype="int4"))
    gd, stt = nnx.split(qm)

    @jax.jit
    def contig_step(state, ids):
        mm = nnx.merge(gd, state)
        s4_prepare(mm)
        caches = init_kv_cache(mm.cfg, 1, 256, quantized="int4")
        _, caches = mm(ids, caches=caches, cache_pos=0)
        lg, _ = mm(ids[:, :1], positions=jnp.full((1, 1), ids.shape[1]),
                   caches=caches, cache_pos=ids.shape[1])
        return lg[0, 0].astype(jnp.float32)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 32000, (1, 100)), jnp.int32)
    ref = np.asarray(contig_step(stt, ids))
    from neural_compressor_tpu.serving.engine import ContinuousBatchingEngine

    eng = ContinuousBatchingEngine(qm, n_slots=1, max_len=256, paged=True,
                                   page_size=128, n_pages=4,
                                   prefill_chunk=128)
    r = eng.submit(np.asarray(ids[0]), max_new_tokens=2)
    eng.run(chunk=1)
    # compare the first generated token (argmax of the same logits)
    print("paged first tok:", r.generated[0],
          "contig argmax:", int(ref.argmax()),
          "agree:", r.generated[0] == int(ref.argmax()), flush=True)


if __name__ == "__main__":
    main()
