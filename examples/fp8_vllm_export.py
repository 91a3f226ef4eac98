"""FP8 quantization + vLLM-compatible (compressed-tensors float-quantized)
checkpoint export/import (reference fp8_quant/save_load.py:208
``convert_weight_to_vllm_compatible``).

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/fp8_vllm_export.py
"""
import sys
import tempfile

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.quantization.export_hf import (
    export_fp8_compressed_tensors,
    load_fp8_compressed_tensors,
)

ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
model = LlamaForCausalLM.from_preset("llama-test")
qmodel = nq.quantize(model, nq.FP8Config(), run_fn=lambda m: m(ids))
ref = qmodel(ids)

with tempfile.TemporaryDirectory() as d:
    export_fp8_compressed_tensors(qmodel, d)
    print("exported fp8 checkpoint:", d)
    import json
    import os

    with open(os.path.join(d, "quantization_config.json")) as f:
        print(json.dumps(json.load(f)["config_groups"]["group_0"]["weights"],
                         indent=2))
    fresh = LlamaForCausalLM.from_preset("llama-test")
    loaded = load_fp8_compressed_tensors(d, fresh)
    out = loaded(ids)
    err = float(jnp.max(jnp.abs(out - ref)))
    print("round-trip max abs diff:", err)
    assert err < 1e-5
    print("OK — the checkpoint is consumable by vLLM/llm-compressor "
          "(float-quantized scheme)")
