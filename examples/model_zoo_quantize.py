"""Quantize + generate across the whole model zoo (9 families).

Each family exercises a different structure: GQA+RoPE (llama), fused
c_attn (gpt2), MoE experts (mixtral), learned positions (opt), parallel
residual + interleaved rotary (gpt-j), ALiBi (bloom), multi-query
attention (falcon), fused per-head QKV + partial rotate-half rotary
(gpt-neox), single-LN parallel residual with biases (phi).

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/model_zoo_quantize.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np
import jax.numpy as jnp
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.generation import greedy_search
from neural_compressor_tpu.models import (
    BloomForCausalLM, DeepseekForCausalLM, FalconForCausalLM, GPT2Config,
    GPT2LMHeadModel, GemmaForCausalLM, GPTJForCausalLM, GPTNeoXForCausalLM,
    LlamaForCausalLM, MixtralForCausalLM, OPTForCausalLM, PhiForCausalLM)


def builders():
    yield "llama", lambda: LlamaForCausalLM.from_preset("llama-test")
    yield "gpt2", lambda: GPT2LMHeadModel(
        GPT2Config(vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                   n_positions=64), nnx.Rngs(0))
    yield "mixtral", lambda: MixtralForCausalLM.from_preset("mixtral-test")
    yield "opt", lambda: OPTForCausalLM.from_preset("opt-test")
    yield "gptj", lambda: GPTJForCausalLM.from_preset("gptj-test")
    yield "bloom", lambda: BloomForCausalLM.from_preset("bloom-test")
    yield "falcon", lambda: FalconForCausalLM.from_preset("falcon-test")
    yield "gptneox", lambda: GPTNeoXForCausalLM.from_preset("gptneox-test")
    yield "phi", lambda: PhiForCausalLM.from_preset("phi-test")
    yield "gemma2", lambda: GemmaForCausalLM.from_preset("gemma2-test")
    yield "gemma3", lambda: GemmaForCausalLM.from_preset("gemma3-test")
    yield "deepseek", lambda: DeepseekForCausalLM.from_preset("deepseek-test")


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (1, 8)))
    for name, build in builders():
        qm = nq.quantize(build(), nq.RTNConfig(dtype="int4", group_size=32))
        out = greedy_search(qm, ids, max_new_tokens=8)
        print(f"{name:8s} int4-quantized, generated {out.shape[1] - 8} "
              f"tokens: {np.asarray(out)[0, 8:].tolist()}")


if __name__ == "__main__":
    main()
