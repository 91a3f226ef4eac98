"""KV-cache quantization: int8 / fp8-e4m3 / packed int4 cache formats.

The cache is the long-context and batched-serving memory lever: int8/fp8
halve cache HBM bytes vs bf16 (measured lossless on the in-repo LM), and
packed int4 (two nibbles per byte, half-split along D) quarters them at a
measured Δppl ≈ +0.08 (PERF_NOTES.md). The format rides the model flags
set by ``KVCacheQuantConfig`` — generation and the serving engine allocate
matching caches automatically.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.evaluation.lm_eval import decode_perplexity
from neural_compressor_tpu.generation import greedy_search
from neural_compressor_tpu.models import LlamaForCausalLM


def main():
    model = LlamaForCausalLM.from_preset("llama-test")
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
    val = np.random.default_rng(1).integers(0, 256, (8, 48))

    d_fp = decode_perplexity(model, val, batch_size=8)
    print(f"decode ppl, bf16 cache: {d_fp:.3f}")
    for fmt in ("int8", "fp8_e4m3", "int4"):
        d = decode_perplexity(model, val, batch_size=8, kv_quantized=fmt)
        print(f"decode ppl, {fmt:9s} cache: {d:.3f} (delta {d - d_fp:+.4f})")

    # the config entry flags the model; generation allocates the format
    qm = nq.quantize(model, nq.KVCacheQuantConfig(dtype="int4"))
    out = greedy_search(qm, ids, max_new_tokens=8)
    print(f"generated through the int4 cache: {out.shape}")


if __name__ == "__main__":
    main()
