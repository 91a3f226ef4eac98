"""Accuracy-driven per-layer fallback: escalate the most quantization-
sensitive ops to higher precision until the accuracy goal is met."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.quantization.layer_fallback import (
    autotune_layer_fallback,
)
from neural_compressor_tpu.models import LlamaForCausalLM


def main():
    model = LlamaForCausalLM.from_preset("llama-test")
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
    y_ref = model(ids).astype(jnp.float32)

    def eval_fn(m):
        y = m(ids).astype(jnp.float32)
        return 1.0 - float(jnp.linalg.norm(y_ref - y)
                           / jnp.linalg.norm(y_ref))

    best, fallbacks = autotune_layer_fallback(
        model, nq.RTNConfig(dtype="int2", group_size=32), eval_fn,
        fallback_config=nq.RTNConfig(dtype="int8", group_size=32),
        tolerable_loss=0.10, step=2)
    print(f"goal met with {len(fallbacks)} ops escalated to int8:")
    for name in fallbacks:
        print("  ", name)


if __name__ == "__main__":
    main()
