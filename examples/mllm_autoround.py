"""AutoRound on a multimodal (llava-style) model: the signed-gradient
optimization targets the TEXT decoder stack; the vision tower/projector
follow ``quant_nontext_module`` (reference MLLM semantics,
torch/quantization/config.py:887-1008).

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/mllm_autoround.py
"""
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.models import LlavaForConditionalGeneration

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, 256, (2, 8)))
pixels = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)

# text-only quantization (default): vision tower stays fp
m = LlavaForConditionalGeneration.from_preset("llava-test")
qm = nq.quantize(m, nq.AutoRoundConfig(group_size=32, iters=32),
                 run_fn=lambda mm: mm(ids, pixels))
q_proj = get_module(qm, "language_model.model.layers.0.self_attn.q_proj")
proj = get_module(qm, "multi_modal_projector")
print("text q_proj:", type(q_proj).__name__, "| projector:",
      type(proj).__name__)
assert type(q_proj) is WOQLinear and not isinstance(proj, WOQLinear)

# quant_nontext_module=True: vision Linears quantize too (RTN rounding)
m2 = LlavaForConditionalGeneration.from_preset("llava-test")
qm2 = nq.quantize(
    m2, nq.AutoRoundConfig(group_size=32, iters=32,
                           quant_nontext_module=True),
    run_fn=lambda mm: mm(ids, pixels))
print("with quant_nontext_module: projector =",
      type(get_module(qm2, "multi_modal_projector")).__name__)
logits = qm2(ids, pixels)
print("quantized MLLM forward:", logits.shape)

# image-conditioned generation through the quantized MLLM (one jitted
# prefill + decode program)
from neural_compressor_tpu.generation import greedy_search_mllm

out = greedy_search_mllm(qm2, ids, pixels, max_new_tokens=8)
print("generated:", out[:, ids.shape[1]:])
