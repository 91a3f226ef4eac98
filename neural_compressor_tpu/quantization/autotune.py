"""Accuracy-driven auto-tuning.

Parity target: reference ``autotune`` (torch/quantization/autotune.py:95-163)
and the trial loop of §3.2: expand the config set, evaluate the fp baseline,
quantize+evaluate per trial, stop when eval ≥ baseline·(1−tolerable_loss)
or max_trials is hit, then re-quantize with the best config if the last
trial wasn't the best.

JAX note: models are NNX module graphs; "deepcopy the model per trial"
becomes ``nnx.split`` + rebuild, keeping the fp state on host between
trials so device memory holds one model at a time.
"""

from __future__ import annotations

import copy
from typing import Callable

from flax import nnx

from ..common import logger
from ..common.config import BaseConfig
from ..common.tuning import (
    ConfigLoader,
    TuningConfig,
    TuningMonitor,
    init_tuning,
)
from .quantize import quantize


def _clone_model(model):
    graphdef, state = nnx.split(model)
    return nnx.merge(graphdef, copy.deepcopy(state))


def get_all_config_set():
    from ..common.config import get_all_config_set_from_config_registry

    return get_all_config_set_from_config_registry()


def autotune(model, tune_config: TuningConfig, eval_fn: Callable,
             run_fn: Callable | None = None, run_args=None,
             example_inputs=None, workspace: str | None = None,
             resume: bool = False):
    """Search the expanded config set for the best quantized model.

    ``eval_fn(model) -> float`` (higher is better). Returns the best
    quantized model, or None if no trial met the goal and no trials ran.
    ``workspace`` persists per-trial history; ``resume=True`` skips
    configs already evaluated in a previous session.
    """
    from ..common.utility import options

    best_model = None
    config_loader, tuning_logger, tuning_monitor = init_tuning(tune_config)
    tuning_monitor.attach_workspace(workspace or options.workspace,
                                    resume=resume)
    if tuning_monitor.baseline is None:
        tuning_monitor.set_baseline(eval_fn(_clone_model(model)))
    tuning_logger.tuning_start()

    for trial_index, quant_config in enumerate(config_loader, 1):
        tuning_logger.trial_start(trial_index=trial_index)
        prior = tuning_monitor.lookup_resumed(quant_config)
        if prior is not None:
            logger.info("Trial %d: resumed result %.6f (skipping re-run)",
                        trial_index, prior)
            tuning_monitor.add_trial_result(trial_index, prior, quant_config)
            if tuning_monitor.need_stop():
                best_record = tuning_monitor.get_best_trial_record()
                best_model = quantize(_clone_model(model),
                                      best_record.quant_config,
                                      run_fn=run_fn, run_args=run_args,
                                      example_inputs=example_inputs)
                break
            continue
        tuning_logger.execution_start()
        logger.info("quant config: %r", quant_config)
        try:
            q_model = quantize(_clone_model(model), quant_config,
                               run_fn=run_fn, run_args=run_args,
                               example_inputs=example_inputs)
            tuning_logger.execution_end()
            tuning_logger.evaluation_start()
            eval_result = eval_fn(q_model)
            tuning_logger.evaluation_end()
        except Exception as e:
            # trial-failure recovery (the reference's loop aborts here —
            # SURVEY §5): record the failure and keep searching
            logger.warning("Trial %d failed (%s: %s); continuing.",
                           trial_index, type(e).__name__, e)
            tuning_monitor.add_trial_result(trial_index, float("-inf"),
                                            quant_config)
            continue
        logger.info("Trial %d evaluation result: %.6f", trial_index,
                    eval_result)
        tuning_monitor.add_trial_result(trial_index, eval_result, quant_config)

        if tuning_monitor.need_stop():
            best_record = tuning_monitor.get_best_trial_record()
            if best_record.trial_index != trial_index:
                logger.info("Re-quantizing with best config (trial %d)",
                            best_record.trial_index)
                q_model = quantize(_clone_model(model),
                                   best_record.quant_config, run_fn=run_fn,
                                   run_args=run_args,
                                   example_inputs=example_inputs)
            best_model = q_model
            break
        best_model = q_model

    tuning_logger.tuning_end()
    if best_model is None:
        logger.warning("autotune produced no model (empty config set?)")
    return best_model
