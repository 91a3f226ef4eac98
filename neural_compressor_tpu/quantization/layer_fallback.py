"""Accuracy-driven per-layer precision fallback.

The north-star tuning mode (BASELINE.json: "sweeps group size / bit-width /
per-layer fallback against a perplexity budget") and the reference's
per-op ``set_local`` override machinery, automated: layers are ranked by a
quantization-sensitivity proxy (per-op QDQ error weighted by weight norm),
then the worst offenders are moved to a higher-precision config a few at a
time until the accuracy goal is met.

Each escalation costs one quantize + one eval — O(log L) evals in practice
versus the O(L) of leave-one-out search.
"""

from __future__ import annotations

import copy
from typing import Callable

import jax.numpy as jnp
from flax import nnx

from ..common import logger
from ..layers.module_utils import get_model_info, get_module
from ..quantization.quantize import quantize
from .config import _WOQBase


def _clone(model):
    gd, st = nnx.split(model)
    return nnx.merge(gd, copy.deepcopy(st))


def rank_layer_sensitivity(model, quant_config) -> list[tuple[str, float]]:
    """[(op_name, sensitivity)] sorted desc: relative QDQ error x ‖W‖."""
    from ..algorithms.utils import extract_linear
    from ..ops.qtensor import qdq_tensor

    info = get_model_info(model, quant_config.supported_op_types())
    mapping = quant_config.to_config_mapping(info)
    scores = []
    for (name, _t), cfg in mapping.items():
        mod = get_module(model, name)
        lin = extract_linear(mod)
        if lin is None:
            continue
        w = lin[0].astype(jnp.float32)
        wq = qdq_tensor(w, bits=cfg.weight_bits, group_size=cfg.group_size,
                        scheme=cfg.scheme, dtype=cfg.weight_dtype)
        nrm = float(jnp.linalg.norm(w))
        rel = float(jnp.linalg.norm(w - wq)) / max(nrm, 1e-12)
        scores.append((name, rel * nrm))
    scores.sort(key=lambda kv: -kv[1])
    return scores


def autotune_layer_fallback(model, quant_config: _WOQBase, eval_fn: Callable,
                            fallback_config: _WOQBase | None = None,
                            tolerable_loss: float = 0.01,
                            max_fallback_ops: int | None = None,
                            step: int = 2, run_fn: Callable | None = None,
                            run_args=None):
    """Quantize with ``quant_config``; while the accuracy goal
    ``eval ≥ baseline·(1−tolerable_loss)`` is unmet, escalate the ``step``
    most sensitive remaining ops to ``fallback_config`` (default: int8 RTN)
    and re-quantize. Returns (best_model, fallback_op_names)."""
    from .config import RTNConfig

    if fallback_config is None:
        fallback_config = RTNConfig(dtype="int8",
                                    group_size=quant_config.group_size)
    baseline = eval_fn(_clone(model))
    goal = baseline * (1.0 - tolerable_loss)
    logger.info("layer-fallback tuning: baseline %.6f, goal %.6f",
                baseline, goal)

    ranking = [n for n, _s in rank_layer_sensitivity(model, quant_config)]
    if max_fallback_ops is None:
        max_fallback_ops = len(ranking)

    fallbacks: list[str] = []
    best_model, best_score = None, float("-inf")
    while True:
        cfg = copy.deepcopy(quant_config)
        for name in fallbacks:
            cfg.set_local(name, copy.deepcopy(fallback_config))
        q = quantize(_clone(model), cfg, run_fn=run_fn, run_args=run_args)
        score = eval_fn(q)
        logger.info("fallback trial: %d ops escalated -> %.6f",
                    len(fallbacks), score)
        if score > best_score:
            best_model, best_score = q, score
        if score >= goal:
            logger.info("goal met with %d fallback ops", len(fallbacks))
            break
        remaining = [n for n in ranking if n not in fallbacks]
        if not remaining or len(fallbacks) >= max_fallback_ops:
            logger.warning("goal not met after %d fallbacks (best %.6f)",
                           len(fallbacks), best_score)
            break
        fallbacks.extend(remaining[:step])
    return best_model, fallbacks
