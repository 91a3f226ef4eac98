"""Full-model decode A/B round 2: xor-optimized kernels + W4A8 int-VPU
decode + int8-KV, llama2-7b int4 g128 B=1 T=1024."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, "/root/repo")

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import dequant_matmul
from neural_compressor_tpu.layers.module_utils import named_modules, replace_module
from neural_compressor_tpu.layers.woq_linear import WOQLinear, W4A8Linear
from neural_compressor_tpu.models.llama import (
    LLAMA_PRESETS, LlamaConfig, build_quantized, init_kv_cache)
from neural_compressor_tpu.quantization.fuse import fuse_for_serving

sys.path.insert(0, "/root/repo/experiments")
from decode_ab import measure  # noqa: E402


def main():
    print(f"device: {jax.devices()}", flush=True)
    t0 = time.time()
    qmodel = build_quantized(LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
                             nq.RTNConfig(dtype="int4", group_size=128))
    fuse_for_serving(qmodel)
    print(f"build+quantize+fuse {time.time() - t0:.0f}s", flush=True)

    dequant_matmul.set_default_impl("pallas")
    measure(qmodel, "fused mxu(xor-opt) B=1")
    dequant_matmul.set_default_impl("vpu")
    measure(qmodel, "fused vpu B=1")
    dequant_matmul.set_default_impl("auto")

    # convert to W4A8 serving modules (int8-act VPU decode path)
    n = 0
    for path, mod in list(named_modules(qmodel)):
        if type(mod) is WOQLinear:
            w4a8 = W4A8Linear(mod.packed_weight(),
                              bias=None if mod.bias is None else mod.bias[...],
                              impl=mod.impl)
            replace_module(qmodel, path, w4a8)
            n += 1
    print(f"converted {n} modules to W4A8", flush=True)
    measure(qmodel, "fused W4A8 int-vpu B=1")
    measure(qmodel, "fused W4A8 + int8kv B=1", quant_kv=True)
    measure(qmodel, "fused W4A8 B=8", batch=8)


if __name__ == "__main__":
    main()
