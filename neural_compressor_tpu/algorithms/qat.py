"""QAT — quantization-aware training via fake-quant modules.

Parity target: reference qat (torch/algorithms/qat/): ``TensorQuantizer``
with fake/real quantize + weight packing (tensor_quantizer.py:31-176),
module swap ``convert_model_with_mapping`` (quant_utils.py:77), and
``prepare_qat`` (torch/quantization/quantize.py:221-249). TPU redesign:
``FakeQuantLinear`` keeps the fp kernel as a trainable ``nnx.Param`` and
applies straight-through QDQ inside the jitted forward (gradients flow to
the fp weights); ``convert`` packs the trained weights into serving
modules. Supports int schemes and MX block formats (the reference's
NVFP4/MXFP8 analog)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import logger
from ..layers.module_utils import get_module, replace_module
from ..layers.woq_linear import WOQLinear
from ..ops.qtensor import quantize_act_per_token, quantize_tensor
from ..ops.mx import quantize_mx
from . import register_algo
from .awq import _qdq
from .utils import extract_linear, dump_op_stats


class FakeQuantLinear(nnx.Module):
    """Trainable Linear with straight-through fake quantization."""

    def __init__(self, kernel: jax.Array, bias: jax.Array | None, *,
                 dtype="int4", bits=4, group_size=32, scheme="sym",
                 act_dtype=None, mx_format=None):
        self.in_features, self.out_features = kernel.shape
        self.kernel = nnx.Param(kernel.astype(jnp.float32))
        self.bias = nnx.Param(bias.astype(jnp.float32)) if bias is not None else None
        self.wdtype = dtype
        self.bits = bits
        self.group_size = group_size
        self.scheme = scheme
        self.act_dtype = act_dtype
        self.mx_format = mx_format

    def _fake_w(self):
        w = self.kernel[...]
        if self.mx_format:
            q = quantize_mx(w, self.mx_format, block_size=self.group_size,
                            axis=0)
        else:
            q = _qdq(w, self.bits, self.group_size, self.scheme, self.wdtype)
        return w + jax.lax.stop_gradient(q - w)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self._fake_w()
        if self.act_dtype == "int8":
            x32 = x.astype(jnp.float32)
            q, s = quantize_act_per_token(x32.reshape(-1, x.shape[-1]))
            xq = (q.astype(jnp.float32) * s).reshape(x.shape)
            x = x + jax.lax.stop_gradient(xq.astype(x.dtype) - x)
        y = jnp.dot(x.astype(jnp.float32), w,
                    preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias[...]
        return y.astype(x.dtype)

    def to_serving(self) -> nnx.Module:
        """Finalize trained weights into a packed serving module."""
        if self.mx_format:
            from .mx import MXLinear

            return MXLinear(self.kernel[...],
                            bias=None if self.bias is None else self.bias[...],
                            w_dtype=self.mx_format, blocksize=self.group_size,
                            weight_only=self.act_dtype is None)
        qt = quantize_tensor(self.kernel[...], bits=self.bits,
                             group_size=self.group_size, scheme=self.scheme,
                             dtype=self.wdtype)
        return WOQLinear.from_qtensor(
            qt, bias=None if self.bias is None else self.bias[...])


@register_algo("qat")
def qat_entry(model, configs_mapping, mode="quantize", run_fn=None,
              run_args=None, example_inputs=None, config=None):
    if mode in ("prepare", "quantize"):
        n = 0
        for (name, _t), cfg in configs_mapping.items():
            mod = get_module(model, name)
            lin = extract_linear(mod)
            if lin is None:
                continue
            kernel, bias = lin
            mx_format = getattr(cfg, "mx_format", None)
            replace_module(model, name, FakeQuantLinear(
                kernel, bias, dtype=cfg.weight_dtype, bits=cfg.weight_bits,
                group_size=cfg.group_size, scheme=cfg.scheme,
                act_dtype=getattr(cfg, "act_dtype", None),
                mx_format=mx_format))
            n += 1
        logger.info("QAT-prepared %d Linear ops (fake-quant, trainable)", n)
        if mode == "prepare":
            return model
        # one-shot: user may pass a training fn
        if run_fn is not None:
            run_fn(model) if run_args is None else run_fn(model, run_args)

    n = 0
    for (name, _t), _cfg in configs_mapping.items():
        try:
            mod = get_module(model, name)
        except (AttributeError, KeyError, IndexError):
            continue
        if isinstance(mod, FakeQuantLinear):
            replace_module(model, name, mod.to_serving())
            n += 1
    logger.info("QAT-converted %d fake-quant ops to serving modules", n)
    dump_op_stats(model)
    return model


def prepare_qat(model, quant_config):
    """API-parity alias (reference quantize.py:221)."""
    from ..quantization.quantize import prepare

    return prepare(model, quant_config)
