"""Dynamic W8A8: per-token activation scales computed at serving time.

Parity: reference DynamicQuantConfig path (torch/quantization/config.py:1252,
jax/quantization/layers_dynamic.py). No calibration needed."""

from __future__ import annotations

from ..common import logger
from ..layers.module_utils import get_module, replace_module
from ..layers.qlinear import DynamicQuantLinear
from . import register_algo
from .utils import extract_linear, dump_op_stats


@register_algo("dynamic_quant")
def dynamic_quant_entry(model, configs_mapping, mode="quantize", run_fn=None,
                        run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        return model
    n = 0
    for (name, _t), cfg in configs_mapping.items():
        mod = get_module(model, name)
        lin = extract_linear(mod)
        if lin is None:
            continue
        kernel, bias = lin
        replace_module(model, name, DynamicQuantLinear(kernel, bias=bias))
        n += 1
    logger.info("Dynamic-quantized %d Linear ops (W8A8, per-token scales)", n)
    dump_op_stats(model)
    return model
