"""Accuracy-driven auto-tuning.

Parity target: reference ``autotune`` (torch/quantization/autotune.py:95-163)
and the trial loop of §3.2: expand the config set, evaluate the fp baseline,
quantize+evaluate per trial, stop when eval ≥ baseline·(1−tolerable_loss)
or max_trials is hit, then re-quantize with the best config if the last
trial wasn't the best.

JAX note: models are NNX module graphs; "deepcopy the model per trial"
becomes ``nnx.split`` + a host (numpy) snapshot of the fp state rebuilt per
trial, so device memory holds one working model at a time.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
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


class _HostSnapshot:
    """fp reference state pinned on HOST between trials: the trial's
    quantized model, not a second fp copy, is what device memory holds
    (a 7B bf16 fp model alone fills most of a v5e chip)."""

    def __init__(self, model):
        self._graphdef, state = nnx.split(model)
        self._host = jax.tree.map(lambda x: np.asarray(x), state,
                                  is_leaf=lambda x: hasattr(x, "dtype"))

    def fresh(self):
        state = jax.tree.map(lambda x: x, self._host)
        return nnx.merge(self._graphdef, state)


def get_all_config_set():
    from ..common.config import get_all_config_set_from_config_registry

    return get_all_config_set_from_config_registry()


def autotune(model, tune_config: TuningConfig, eval_fn: Callable,
             run_fn: Callable | None = None, run_args=None,
             example_inputs=None, workspace: str | None = None,
             resume: bool = False):
    """Search the expanded config set for the best quantized model.

    ``eval_fn(model) -> float`` (higher is better). Returns the model
    quantized with the BEST-scoring config — whether the stop rule fired,
    the config set exhausted, or every fresh trial was resumed from
    history — or None if no trial produced a finite score.
    ``workspace`` persists per-trial history; ``resume=True`` skips
    configs already evaluated in a previous session.
    """
    from ..common.utility import options

    snapshot = _HostSnapshot(model)
    config_loader, tuning_logger, tuning_monitor = init_tuning(tune_config)
    tuning_monitor.attach_workspace(workspace or options.workspace,
                                    resume=resume)
    if tuning_monitor.baseline is None:
        tuning_monitor.set_baseline(eval_fn(snapshot.fresh()))
    tuning_logger.tuning_start()

    last_model = None     # the most recent trial's quantized model
    last_trial = None     # its trial index
    stopped = False
    for trial_index, quant_config in enumerate(config_loader, 1):
        tuning_logger.trial_start(trial_index=trial_index)
        prior = tuning_monitor.lookup_resumed(quant_config)
        if prior is not None:
            logger.info("Trial %d: resumed result %.6f (skipping re-run)",
                        trial_index, prior)
            tuning_monitor.add_trial_result(trial_index, prior, quant_config)
            tuning_logger.trial_end(trial_index=trial_index)
            if tuning_monitor.need_stop():
                stopped = True
                break
            continue
        tuning_logger.execution_start()
        logger.info("quant config: %r", quant_config)
        # free the previous trial's quantized model BEFORE building this
        # one: device memory must hold one working model at a time (the
        # _HostSnapshot invariant — two 7B models OOM a v5e)
        last_model = last_trial = q_model = None
        try:
            q_model = quantize(snapshot.fresh(), quant_config,
                               run_fn=run_fn, run_args=run_args,
                               example_inputs=example_inputs)
            tuning_logger.execution_end()
            tuning_logger.evaluation_start()
            eval_result = float(eval_fn(q_model))
            if not np.isfinite(eval_result):
                raise ValueError(
                    f"eval_fn returned a non-finite score {eval_result!r}")
            tuning_logger.evaluation_end()
        except Exception as e:
            # trial-failure recovery (the reference's loop aborts here —
            # SURVEY §5): record the failure and keep searching, but the
            # failed trial still counts toward max_trials
            logger.warning("Trial %d failed (%s: %s); continuing.",
                           trial_index, type(e).__name__, e)
            tuning_monitor.add_trial_result(trial_index, float("-inf"),
                                            quant_config)
            tuning_logger.trial_end(trial_index=trial_index)
            if tuning_monitor.need_stop():
                stopped = True
                break
            continue
        logger.info("Trial %d evaluation result: %.6f", trial_index,
                    eval_result)
        tuning_monitor.add_trial_result(trial_index, eval_result, quant_config)
        tuning_logger.trial_end(trial_index=trial_index)
        last_model, last_trial = q_model, trial_index
        if tuning_monitor.need_stop():
            stopped = True
            break

    tuning_logger.tuning_end()
    best_record = (tuning_monitor.get_best_trial_record()
                   if tuning_monitor.trial_records else None)
    if best_record is None or not np.isfinite(best_record.trial_result):
        logger.warning("autotune produced no model (empty config set or "
                       "every trial failed)")
        return None
    if last_trial == best_record.trial_index and last_model is not None:
        return last_model
    # the best config was an earlier trial, a resumed history entry, or the
    # set exhausted after the best — re-quantize with it
    logger.info("Re-quantizing with best config (trial %d, score %.6f%s)",
                best_record.trial_index, best_record.trial_result,
                "" if stopped else "; config set exhausted")
    del last_model
    return quantize(snapshot.fresh(), best_record.quant_config,
                    run_fn=run_fn, run_args=run_args,
                    example_inputs=example_inputs)
