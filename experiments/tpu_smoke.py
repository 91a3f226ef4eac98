"""Real-TPU smoke of the round-2 kernels (Mosaic compile + run):
fp8-e4m3 KV decode, paged attention (bf16 + int8 pools), VPU matvecs,
read-only int8-KV decode, fp8 SDPA. Tiny llama, a few steps each.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import neural_compressor_tpu as nq
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.models.llama import (
    init_kv_cache, init_paged_pool)

print("device:", jax.devices(), flush=True)
# kernel-friendly dims on real TPU (D=128, heads aligned)
m = LlamaForCausalLM.from_preset(
    "llama-test", hidden_size=512, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=1024)
qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=128))
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, 256, (2, 16)))

# vpu matvec + pallas MXU decode step
from neural_compressor_tpu.kernels import dequant_matmul
for impl in ("vpu", "pallas"):
    dequant_matmul.set_default_impl(impl)
    caches = init_kv_cache(qm.cfg, 2, 32)
    _, caches = qm(ids, caches=caches, cache_pos=0)
    lg, caches = qm(ids[:, :1], positions=jnp.full((2, 1), 16),
                    caches=caches, cache_pos=16)
    print(f"{impl} decode ok:", np.isfinite(
        np.asarray(lg, np.float32)).all(), flush=True)
dequant_matmul.set_default_impl("auto")

# int8 + fp8 KV decode (read-only kernel path)
for fmt in ("int8", "fp8_e4m3"):
    caches = init_kv_cache(qm.cfg, 2, 32, quantized=fmt)
    _, caches = qm(ids, caches=caches, cache_pos=0)
    lg, caches = qm(ids[:, :1], positions=jnp.full((2, 1), 16),
                    caches=caches, cache_pos=16)
    print(f"{fmt}-kv decode ok:", np.isfinite(
        np.asarray(lg, np.float32)).all(), flush=True)

# paged attention, bf16 + int8 pools
for q in (False, "int8"):
    pools = init_paged_pool(qm.cfg, n_pages=8, batch=2, max_len=64,
                            page_size=16, quantized=q)
    bt = np.zeros((2, 4), np.int32)
    bt[0, :2] = [1, 2]
    bt[1, :2] = [3, 4]
    pools = [p._replace(block_tables=jnp.asarray(bt)) for p in pools]
    # write 20 decode steps through the paged path
    caches = pools
    tok = ids[:, :1]
    for step in range(3):
        lg, caches = qm(tok, positions=jnp.full((2, 1), 17 + step),
                        caches=caches, cache_pos=jnp.full((2,), 17 + step))
    print(f"paged({q or 'bf16'}) decode ok:", np.isfinite(
        np.asarray(lg, np.float32)).all(), flush=True)

# fp8 SDPA prefill
qm2 = nq.quantize(
    LlamaForCausalLM.from_preset("llama-test", hidden_size=512,
                                 num_attention_heads=4,
                                 num_key_value_heads=2,
                                 intermediate_size=1024),
    nq.FP8Config(quantize_attention=True, dump_stats_path=None),
    run_fn=lambda mm: mm(ids))
lg = qm2(ids)
print("fp8 sdpa ok:", np.isfinite(np.asarray(lg, np.float32)).all(),
      flush=True)
print("TPU SMOKE OK", flush=True)
