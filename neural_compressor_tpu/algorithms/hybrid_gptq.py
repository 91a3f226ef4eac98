"""Hybrid GPTQ: W4A8 (int4 weights, int8 activations).

Parity target: reference HybridGPTQQuantizer
(torch/algorithms/mixed_low_precision/quantizer.py:20) — run GPTQ for the
int4 weights, then serve through the mixed-precision module
(HPUMixedPrecisionLinear -> here W4A8Linear with the int8-MXU kernel).
"""

from __future__ import annotations

from ..common import logger
from ..layers.module_utils import named_modules, replace_module, get_module
from ..layers.woq_linear import WOQLinear, W4A8Linear
from . import register_algo
from .gptq import gptq_entry


@register_algo("hybrid_gptq")
def hybrid_gptq_entry(model, configs_mapping, mode="quantize", run_fn=None,
                      run_args=None, example_inputs=None, config=None):
    model = gptq_entry(model, configs_mapping, mode=mode, run_fn=run_fn,
                       run_args=run_args, example_inputs=example_inputs,
                       config=config)
    if mode == "prepare":
        return model
    n = 0
    for path, mod in list(named_modules(model)):
        if type(mod) is WOQLinear:
            w4a8 = W4A8Linear(
                mod.packed_weight(),
                bias=None if mod.bias is None else mod.bias[...],
                impl=mod.impl,
                pre_scale=(None if mod.pre_scale is None
                           else mod.pre_scale[...]))
            if hasattr(mod, "scale_bf16_to_fp8"):
                w4a8.scale_bf16_to_fp8 = mod.scale_bf16_to_fp8
            replace_module(model, path, w4a8)
            n += 1
    logger.info("Hybrid GPTQ: %d modules serving W4A8", n)
    return model
