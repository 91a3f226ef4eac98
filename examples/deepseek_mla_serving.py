"""Quantize and serve a DeepSeek-V3-style model: MLA latent KV cache +
stacked expert-parallel MoE.

The two serving transforms this family adds on top of the standard
quantize -> generate flow:
  * ``enable_mla_latent_cache``: decode over ONE latent row per token
    ([kv_lora_rank | rope] = 576 floats/tok at v3 scale vs 40960 for
    expanded per-head K/V — 71x more tokens per GB of cache)
  * ``stack_experts_for_serving``: the 256-expert MoE becomes capacity-
    dispatched [E, ...] stacked kernels whose expert axis shards over the
    mesh "model" axis (expert parallelism)

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/deepseek_mla_serving.py
"""
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.generation import greedy_search
from neural_compressor_tpu.models import (DeepseekForCausalLM,
                                          enable_mla_latent_cache)
from neural_compressor_tpu.models.mixtral import stack_experts_for_serving

model = DeepseekForCausalLM.from_preset("deepseek-test")
cfg = model.cfg
ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 12)))

# int4 weight-only: MLA factors (q_a/q_b/kv_a/kv_b), o_proj, every routed
# and shared expert leg; the sigmoid router is a raw parameter and stays fp
qmodel = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=32))
ref = greedy_search(qmodel, ids, max_new_tokens=8)

# MoE -> stacked EP form (shards over a mesh "model" axis)
n_moe = stack_experts_for_serving(qmodel, capacity_factor=2.0)

# expanded per-head K/V -> latent rows
n_attn = enable_mla_latent_cache(qmodel)
out = greedy_search(qmodel, ids, max_new_tokens=8)

exp = cfg.num_attention_heads * (cfg.qk_head_dim + cfg.v_head_dim)
lat = cfg.kv_lora_rank + cfg.qk_rope_head_dim
print(f"stacked {n_moe} MoE block(s), latent cache on {n_attn} layer(s)")
print(f"cache floats/token: expanded {exp} -> latent {lat} "
      f"({exp / lat:.1f}x; deepseek-v3 scale: 40960 -> 576 = 71x)")
print("tokens (expanded):", np.asarray(ref)[0, -8:])
print("tokens (latent):  ", np.asarray(out)[0, -8:])
# equal math, different bf16 rounding order — on a RANDOM tiny model a
# near-tied argmax can flip late in the sequence; the f32 equality is
# asserted in tests/test_deepseek.py::test_latent_cache_matches_expanded
