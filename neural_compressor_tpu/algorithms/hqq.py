"""HQQ — half-quadratic quantization (data-free, asymmetric).

Parity target: reference HQQ (torch/algorithms/weight_only/hqq/):
``optimize_weights_proximal_legacy`` (optimizer.py:28) — alternating
proximal iterations on (zero, scale): quantize with current params, shrink
the residual with an lp-norm soft-threshold, refit the zero point in closed
form. Jitted as a ``lax.fori_loop``; runs entirely on device."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..common import logger
from ..layers.module_utils import get_module, replace_module
from ..layers.woq_linear import WOQLinear
from ..ops.qtensor import QTensor
from . import register_algo
from .utils import extract_linear, dump_op_stats

_FLOAT_SKIP = ("fp32", "bf16", "fp16")


def _shrink_lp(x: jax.Array, beta: float, p: float) -> jax.Array:
    """lp-norm soft threshold (reference optimizer.py:20-25)."""
    return jnp.sign(x) * jnp.maximum(
        jnp.abs(x) - (1.0 / beta) * jnp.abs(x) ** (p - 1), 0.0)


@functools.partial(jax.jit, static_argnames=("bits", "G", "iters"))
def hqq_optimize(w: jax.Array, bits: int, G: int, iters: int = 20,
                 beta: float = 1e1, kappa: float = 1.01,
                 lp_norm: float = 0.7):
    """Proximal optimization of (scale, zero) per group.

    w: [K, N]. Returns (codes int8 centered, scales [K/G, N],
    zeros [K/G, N] centered)."""
    K, N = w.shape
    wg = w.astype(jnp.float32).reshape(K // G, G, N)
    qmax = 2.0**bits - 1.0
    amax = jnp.max(wg, axis=1)
    amin = jnp.min(wg, axis=1)
    scale = (amax - amin) / qmax
    scale = jnp.where(scale <= 0, 1.0, scale)
    zero = jnp.round(-amin / scale)

    def body(i, carry):
        zero, beta = carry
        q = jnp.clip(jnp.round(wg / scale[:, None, :] + zero[:, None, :]),
                     0, qmax)
        wr = (q - zero[:, None, :]) * scale[:, None, :]
        e = _shrink_lp(wg - wr, beta, lp_norm)
        zero = jnp.mean(q - (wg - e) / scale[:, None, :], axis=1)
        return zero, beta * kappa

    zero, _ = jax.lax.fori_loop(0, iters, body, (zero, beta))
    q = jnp.clip(jnp.round(wg / scale[:, None, :] + zero[:, None, :]), 0, qmax)
    half = 2.0 ** (bits - 1)
    codes = (q - half).astype(jnp.int8).reshape(K, N)
    return codes, scale, zero - half


@register_algo("hqq")
def hqq_entry(model, configs_mapping, mode="quantize", run_fn=None,
              run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        return model
    n = 0
    for (name, _t), cfg in configs_mapping.items():
        if cfg.dtype in _FLOAT_SKIP:
            continue
        mod = get_module(model, name)
        lin = extract_linear(mod)
        if lin is None:
            continue
        kernel, bias = lin
        K, N = kernel.shape
        G = cfg.group_size if cfg.group_size > 0 else K
        if K % G:
            G = K
        codes, scales, zeros = hqq_optimize(
            kernel, cfg.weight_bits, G, iters=cfg.iters, beta=cfg.beta,
            kappa=cfg.kappa, lp_norm=cfg.lp_norm)
        qt = QTensor(codes, scales, zeros, "int", cfg.weight_bits, G, (K, N))
        replace_module(model, name, WOQLinear.from_qtensor(qt, bias=bias))
        n += 1
    logger.info("HQQ quantized %d Linear ops", n)
    dump_op_stats(model)
    return model
