"""prepare / convert / quantize — the user-facing lifecycle.

Parity: neural_compressor/torch/quantization/quantize.py:136-333 (same
three-verb lifecycle and dispatch-over-registered-algorithms loop), redone
for NNX module graphs. ``prepare`` inserts observers / calibration capture,
the user runs their calibration function, ``convert`` computes scales and
swaps in quantized modules. ``quantize`` is the one-shot fusion of all
three.
"""

from __future__ import annotations

import weakref
from typing import Any, Callable

from ..common import logger
from ..common.config import BaseConfig, ComposableConfig
from ..algorithms import get_algo_entry
from ..layers.module_utils import get_model_info

PREPARE = "prepare"
CONVERT = "convert"
QUANTIZE = "quantize"

# model -> state stashed between prepare() and convert()
_prepared_state: "weakref.WeakKeyDictionary[Any, dict]" = weakref.WeakKeyDictionary()


def _config_items(quant_config: BaseConfig):
    if isinstance(quant_config, ComposableConfig):
        return list(quant_config.config_list)
    return [quant_config]


def _dispatch(model, quant_config: BaseConfig, mode: str,
              run_fn: Callable | None = None, run_args=None,
              example_inputs=None):
    for cfg in _config_items(quant_config):
        model_info = get_model_info(model, cfg.supported_op_types())
        configs_mapping = cfg.to_config_mapping(model_info)
        if not configs_mapping:
            logger.warning("Config %s matched no ops; skipping.", cfg.name)
            continue
        entry = get_algo_entry(cfg.name)
        logger.info("[%s] applying %s to %d ops", mode, cfg.name,
                    len(configs_mapping))
        model = entry(model, configs_mapping, mode=mode, run_fn=run_fn,
                      run_args=run_args, example_inputs=example_inputs,
                      config=cfg)
    return model


def prepare(model, quant_config: BaseConfig, example_inputs=None):
    """Insert observers/capture machinery. Returns the (mutated) model."""
    model = _dispatch(model, quant_config, PREPARE,
                      example_inputs=example_inputs)
    _prepared_state[model] = {"config": quant_config}
    return model


def convert(model, quant_config: BaseConfig | None = None, example_inputs=None):
    """Finalize quantization on a prepared (calibrated) model."""
    state = _prepared_state.pop(model, None)
    if quant_config is None:
        assert state is not None, (
            "convert() without a config requires a model returned by prepare()")
        quant_config = state["config"]
    return _dispatch(model, quant_config, CONVERT,
                     example_inputs=example_inputs)


def finalize_calibration(model):
    """No-op hook kept for API parity (reference quantize.py:328): stats
    live in ObserverStat variables and need no flushing."""
    return model


def quantize(model, quant_config: BaseConfig, run_fn: Callable | None = None,
             run_args=None, example_inputs=None):
    """One-shot prepare → calibrate → convert."""
    return _dispatch(model, quant_config, QUANTIZE, run_fn=run_fn,
                     run_args=run_args, example_inputs=example_inputs)


# single source of truth for the run_fn/run_args dispatch shape
from ..algorithms.quantize_helpers import run_user_calibration as run_calibration  # noqa: E402,F401


def prepare_qat(model, quant_config, example_inputs=None):
    """Insert trainable fake-quant modules (QAT). API parity:
    reference prepare_qat (torch/quantization/quantize.py:221-249)."""
    return prepare(model, quant_config, example_inputs=example_inputs)
