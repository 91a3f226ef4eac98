"""Static W8A8: calibrated per-tensor activation scales.

Parity: reference StaticQuantQuantizer (torch/algorithms/static_quant/) and
the Keras-3 static path (jax/algorithms/static.py): prepare inserts
observers, calibration runs the model, convert computes scales and swaps
quantized modules (int8×int8 MXU dot)."""

from __future__ import annotations

from ..common import logger
from ..layers.module_utils import get_module, replace_module
from ..layers.observers import MinMaxObserver, MaxAbsObserver, ObservedLinear
from ..layers.qlinear import StaticQuantLinear
from . import register_algo
from .quantize_helpers import run_user_calibration
from .utils import extract_linear, dump_op_stats


@register_algo("static_quant")
def static_quant_entry(model, configs_mapping, mode="quantize", run_fn=None,
                       run_args=None, example_inputs=None, config=None):
    if mode in ("prepare", "quantize"):
        for (name, _t), cfg in configs_mapping.items():
            mod = get_module(model, name)
            if extract_linear(mod) is None:
                continue
            obs = (MaxAbsObserver() if getattr(cfg, "act_sym", True)
                   else MinMaxObserver())
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
        kernel, bias = extract_linear(wrapped.inner)
        obs = wrapped.act_observer
        if isinstance(obs, MaxAbsObserver):
            act_scale = obs.amax[...] / 127.0
            act_zp = None
        else:
            act_scale, act_zp = obs.get_scale_zp(bits=8, sym=False)
        replace_module(model, name,
                       StaticQuantLinear(kernel, act_scale, bias=bias,
                                         act_zero_point=act_zp))
        n += 1
    logger.info("Static-quantized %d Linear ops (W8A8)", n)
    dump_op_stats(model)
    return model
