"""MX (microscaling) quantization entry.

Parity: reference MXQuantizer/MXLinear (torch/algorithms/mx_quant/mx.py:33,
100): weights QDQ'd in an MX format at convert time; activations optionally
MX-quantized at call time (weight_only=False)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import logger
from ..layers.module_utils import get_module, replace_module
from ..ops.mx import quantize_mx
from . import register_algo
from .utils import extract_linear, dump_op_stats


class MXLinear(nnx.Module):
    """Linear with MX-format weight (QDQ, stored bf16) and optional
    at-call MX activation quantization."""

    def __init__(self, kernel: jax.Array, bias=None, w_dtype="mxfp8_e4m3",
                 act_dtype="mxfp8_e4m3", blocksize=32, weight_only=False,
                 out_dtype=jnp.bfloat16):
        self.in_features, self.out_features = kernel.shape
        wq = quantize_mx(kernel.astype(jnp.float32), w_dtype.replace("mx", ""),
                         block_size=blocksize, axis=0)
        self.kernel = nnx.Param(wq.astype(out_dtype))
        self.bias = nnx.Param(bias) if bias is not None else None
        self.act_dtype = act_dtype
        self.blocksize = blocksize
        self.weight_only = weight_only

    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.weight_only:
            x = quantize_mx(x, self.act_dtype.replace("mx", ""),
                            block_size=self.blocksize, axis=-1)
        y = jnp.dot(x.astype(self.kernel[...].dtype), self.kernel[...],
                    preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y.astype(x.dtype)


@register_algo("mx_quant")
def mx_entry(model, configs_mapping, mode="quantize", run_fn=None,
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
        replace_module(model, name, MXLinear(
            kernel, bias=bias, w_dtype=cfg.w_dtype, act_dtype=cfg.act_dtype,
            blocksize=cfg.blocksize, weight_only=cfg.weight_only))
        n += 1
    logger.info("MX-quantized %d Linear ops (%s)", n,
                config.w_dtype if config else "mxfp8")
    dump_op_stats(model)
    return model
