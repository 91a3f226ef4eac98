"""Static W8A8: calibrated per-tensor activation scales.

Parity: reference StaticQuantQuantizer (torch/algorithms/static_quant/) and
the Keras-3 static path (jax/algorithms/static.py): prepare inserts
observers, calibration runs the model, convert computes scales and swaps
quantized modules (int8×int8 MXU dot)."""

from __future__ import annotations

from ..common import logger
from ..layers.module_utils import get_module, replace_module
from ..layers.observers import (
    HistogramObserver,
    MaxAbsObserver,
    MaxAbsPerChannelObserver,
    MinMaxObserver,
    ObservedLinear,
)
from ..layers.qlinear import StaticQuantLinear
from . import register_algo
from .quantize_helpers import run_user_calibration
from .utils import extract_linear, dump_op_stats


def _make_observer(cfg, in_features: int):
    """Observer per the config's activation calibration algorithm
    (reference act_algo: minmax | kl/percentile-style; fp8_quant observers
    observer.py:106-154)."""
    algo = getattr(cfg, "act_algo", "minmax")
    if getattr(cfg, "act_granularity", "per_tensor") == "per_channel":
        return MaxAbsPerChannelObserver(in_features)
    if algo in ("percentile", "mse", "histogram"):
        return HistogramObserver()
    if getattr(cfg, "act_sym", True):
        return MaxAbsObserver()
    return MinMaxObserver()


def _act_scale_from(obs, cfg):
    if isinstance(obs, MaxAbsPerChannelObserver):
        import jax.numpy as jnp

        s = obs.amax[...] / 127.0
        return jnp.where(s <= 0, 1.0, s), None
    if isinstance(obs, HistogramObserver):
        algo = getattr(cfg, "act_algo", "percentile")
        method = "mse" if algo == "mse" else "percentile"
        return obs.get_scale(bits=8, method=method,
                             percentile=getattr(cfg, "percentile", 99.99)), None
    if isinstance(obs, MaxAbsObserver):
        return obs.amax[...] / 127.0, None
    return obs.get_scale_zp(bits=8, sym=False)


@register_algo("static_quant")
def static_quant_entry(model, configs_mapping, mode="quantize", run_fn=None,
                       run_args=None, example_inputs=None, config=None):
    from ..layers.module_utils import module_type_name
    from ..layers.qconv import StaticQuantConv, conv_spec_of, \
        flatten_conv_kernel

    if mode in ("prepare", "quantize"):
        for (name, _t), cfg in configs_mapping.items():
            mod = get_module(model, name)
            if module_type_name(mod) == "Conv":
                # conv act scales are per-tensor (per-channel scales
                # cannot fold into kh·kw·cin weight rows)
                if getattr(cfg, "act_granularity",
                           "per_tensor") == "per_channel":
                    raise ValueError(
                        f"static quant of Conv {name!r}: per_channel "
                        "activation granularity is not supported — use "
                        "per_tensor")
                if not getattr(cfg, "act_sym", True):
                    raise ValueError(
                        f"static quant of Conv {name!r}: asymmetric "
                        "activations are not supported — set act_sym=True")
                obs = _make_observer(cfg, mod.in_features)
                replace_module(model, name, ObservedLinear(mod, obs))
                continue
            lin = extract_linear(mod)
            if lin is None:
                continue
            obs = _make_observer(cfg, lin[0].shape[0])
            replace_module(model, name, ObservedLinear(mod, obs))
        if mode == "prepare":
            return model
        run_user_calibration(model, run_fn, run_args)

    n = 0
    for (name, _t), cfg in configs_mapping.items():
        try:
            wrapped = get_module(model, name)
        except (AttributeError, KeyError, IndexError):
            continue  # inner path of an already-converted wrapper
        if not isinstance(wrapped, ObservedLinear):
            continue
        act_scale, act_zp = _act_scale_from(wrapped.act_observer, cfg)
        if module_type_name(wrapped.inner) == "Conv":
            conv = wrapped.inner
            assert act_zp is None, \
                "StaticQuantConv activation scales are symmetric-only"
            replace_module(model, name, StaticQuantConv(
                flatten_conv_kernel(conv.kernel[...]), act_scale,
                conv_spec_of(conv),
                bias=None if conv.bias is None else conv.bias[...]))
            n += 1
            continue
        kernel, bias = extract_linear(wrapped.inner)
        replace_module(model, name,
                       StaticQuantLinear(kernel, act_scale, bias=bias,
                                         act_zero_point=act_zp))
        n += 1
    logger.info("Static-quantized %d ops (W8A8)", n)
    dump_op_stats(model)
    return model
