"""Calibrated streaming GPTQ of an HF checkpoint larger than RAM.

Builds a tiny HF llama checkpoint on the fly (stand-in for a real one),
then quantizes it layer-by-layer: each decoder layer is loaded from the
shards, calibrated on streamed hidden states, GPTQ-quantized, written out
and freed — the full fp model never exists in memory.

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/streaming_gptq.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import tempfile

import numpy as np
import jax.numpy as jnp

import neural_compressor_tpu as nq
from neural_compressor_tpu.quantization.layer_wise import (
    gptq_quantize_checkpoint_streaming,
    load_quantized_checkpoint,
)


def make_checkpoint(path):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=4, num_attention_heads=4,
                      num_key_value_heads=2)
    LlamaForCausalLM(cfg).eval().float().save_pretrained(
        path, safe_serialization=True)


def main():
    src = tempfile.mkdtemp(prefix="hf_src_")
    out = tempfile.mkdtemp(prefix="hf_q_")
    make_checkpoint(src)

    calib = np.random.default_rng(0).integers(0, 256, (8, 32))
    gptq_quantize_checkpoint_streaming(
        src, nq.GPTQConfig(dtype="int4", group_size=32, block_size=32),
        out, calib, dtype=jnp.float32)

    model = load_quantized_checkpoint(out, dtype=jnp.float32)
    ids = jnp.asarray(calib[:2, :16])
    print("quantized model logits:", model(ids).shape)


if __name__ == "__main__":
    main()
