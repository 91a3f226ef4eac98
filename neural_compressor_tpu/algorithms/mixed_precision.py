"""Mixed precision: convert matched ops to bf16/fp16.

Parity: reference HalfPrecisionConverter (torch/algorithms/mixed_precision/
half_precision_convert.py:28)."""

from __future__ import annotations

import jax.numpy as jnp

from ..common import logger
from ..layers.module_utils import get_module, replace_module
from ..layers.qlinear import HalfPrecisionLinear
from . import register_algo
from .utils import extract_linear, dump_op_stats

_DTYPES = {"bf16": jnp.bfloat16, "fp16": jnp.float16,
           "bfloat16": jnp.bfloat16, "float16": jnp.float16}


@register_algo("mixed_precision")
def mixed_precision_entry(model, configs_mapping, mode="quantize",
                          run_fn=None, run_args=None, example_inputs=None,
                          config=None):
    if mode == "prepare":
        return model
    n = 0
    for (name, _t), cfg in configs_mapping.items():
        mod = get_module(model, name)
        lin = extract_linear(mod)
        if lin is None:
            continue
        kernel, bias = lin
        replace_module(model, name,
                       HalfPrecisionLinear(kernel, bias=bias,
                                           dtype=_DTYPES[cfg.dtype]))
        n += 1
    logger.info("Converted %d Linear ops to %s", n,
                config.dtype if config else "bf16")
    dump_op_stats(model)
    return model
