"""RTN — round-to-nearest weight-only quantization.

Parity target: reference ``RTNQuantizer``
(neural_compressor/torch/algorithms/weight_only/rtn.py:68-270) +
``rtn_entry`` (torch/quantization/algorithm_entry.py:63-118). TPU redesign:
no per-layer device shuttling — each kernel quantizes as one jitted
group-wise transform; all layers stream through XLA back-to-back.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common import logger
from ..layers.module_utils import get_module, replace_module, named_modules
from ..layers.woq_linear import WOQLinear
from ..ops.qtensor import quantize_tensor, search_clip, QTensor
from ..ops.packing import apply_double_quant, pack_qtensor
from . import register_algo
from .utils import extract_linear, dump_op_stats

_FLOAT_SKIP = ("fp32", "bf16", "fp16", "float32", "bfloat16", "float16")


def rtn_quantize_kernel(kernel, cfg) -> QTensor:
    """Quantize one [K, N] kernel per an RTN-style config (shared with other
    algorithms for their final rounding step)."""
    w = kernel.astype(jnp.float32)
    if getattr(cfg, "use_mse_search", False):
        ratios = search_clip(w, bits=cfg.weight_bits, group_size=cfg.group_size,
                             scheme=cfg.scheme, dtype=cfg.weight_dtype)
        G = cfg.group_size if cfg.group_size > 0 else w.shape[0]
        # clip each group to its best ratio then round
        K, N = w.shape
        pad = (-K) % G
        wp = jnp.pad(w, ((0, pad), (0, 0)))
        wg = wp.reshape(-1, G, N)
        absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
        lim = absmax * ratios[:, None, :]
        w = jnp.clip(wg, -lim, lim).reshape(-1, N)[:K]
    qt = quantize_tensor(w, bits=cfg.weight_bits, group_size=cfg.group_size,
                         scheme=cfg.scheme, dtype=cfg.weight_dtype,
                         full_range=getattr(cfg, "use_full_range", False))
    return qt


@register_algo("rtn")
def rtn_entry(model, configs_mapping, mode="quantize", run_fn=None,
              run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        return model  # RTN needs no calibration
    from ..layers.module_utils import module_type_name
    from ..layers.qconv import (WOQConv, WOQLinearGeneral, conv_spec_of,
                                flatten_conv_kernel, linear_general_qmatrix)

    n_done = 0
    for (name, op_type), cfg in configs_mapping.items():
        if cfg.dtype in _FLOAT_SKIP:
            continue
        mod = get_module(model, name)
        t = module_type_name(mod)
        # non-Linear quantizable ops (reference Conv2d static/Keras conv
        # layers, JAX-frontend Conv2D/MHA — layers_static.py:681-770):
        # flatten to the [K, N] quant view, pack, swap the conv/general
        # module (layers/qconv.py)
        if t == "Conv":
            spec = conv_spec_of(mod)
            kernel = flatten_conv_kernel(mod.kernel[...])
            bias = None if mod.bias is None else mod.bias[...]
            pw = _rtn_pack(kernel, cfg)
            replace_module(model, name, WOQConv(pw, spec, bias=bias))
            n_done += 1
            continue
        if t == "LinearGeneral":
            kernel, bias, out_shape, n_in = linear_general_qmatrix(mod)
            pw = _rtn_pack(kernel, cfg)
            replace_module(model, name,
                           WOQLinearGeneral(pw, out_shape, n_in, bias=bias))
            n_done += 1
            continue
        lin = extract_linear(mod)
        if lin is None:
            continue
        kernel, bias = lin
        pw = _rtn_pack(kernel, cfg)
        replace_module(model, name, WOQLinear(pw, bias=bias))
        n_done += 1
    logger.info("RTN quantized %d ops", n_done)
    dump_op_stats(model)
    return model


def _rtn_pack(kernel, cfg):
    qt = rtn_quantize_kernel(kernel, cfg)
    pw = pack_qtensor(qt)
    if getattr(cfg, "use_double_quant", False):
        # REAL double quant: int8 scale codes in storage (reference
        # weight_only/utility.py:273-436), dequantized at kernel entry
        pw = apply_double_quant(
            pw, bits=cfg.double_quant_bits,
            group_size=cfg.double_quant_group_size,
            sym=cfg.double_quant_use_sym)
    return pw
