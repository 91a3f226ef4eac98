"""AutoRound — signed-gradient rounding optimization.

Parity target: the reference's AutoRound adapter
(torch/algorithms/autoround/autoround.py:52 — delegating to the external
``auto_round`` package) re-implemented natively: learnable per-element
rounding offsets V ∈ [−0.5, 0.5] plus min/max clip-range factors, trained
with **signed** gradient descent (the AutoRound paper's optimizer) against
the quantized output MSE on a captured input sample. The whole optimization
is one jitted ``lax.fori_loop``; gradients flow through the rounding via STE.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..common import logger
from ..layers.module_utils import get_module, named_modules, replace_module
from ..layers.woq_linear import WOQLinear
from ..ops.qtensor import QTensor, quantize_with_scale
from . import register_algo
from .awq import ActStatObserver
from .calib_capture import CalibCaptureState, find_target_blocks, run_capture
from .gptq import _as_next_input
from .utils import extract_linear, dump_op_stats

_FLOAT_SKIP = ("fp32", "bf16", "fp16")


@functools.partial(
    jax.jit,
    static_argnames=("bits", "G", "sym", "iters", "lr", "minmax_lr",
                     "enable_minmax"),
)
def autoround_optimize(X, W, *, bits, G, sym, iters=200, lr=0.005,
                       minmax_lr=0.005, enable_minmax=True):
    """Optimize rounding offsets (and clip range) for one kernel.

    X: [S, K] sample, W: [K, N]. Returns (Wq QDQ [K, N], scales, zeros)."""
    K, N = W.shape
    Wf = W.astype(jnp.float32)
    wg = Wf.reshape(K // G, G, N)
    Y = X @ Wf
    qmax_s = 2 ** (bits - 1) - 1
    qmax_u = 2**bits - 1
    half = 2 ** (bits - 1)

    def make_qdq(V, a, b):
        amax = jnp.max(wg, axis=1) * a
        amin = jnp.min(wg, axis=1) * b
        if sym:
            scale = jnp.maximum(jnp.abs(amax), jnp.abs(amin)) / qmax_s
            scale = jnp.where(scale <= 0, 1.0, scale)
            zero = jnp.zeros_like(scale)
            raw = wg / scale[:, None, :] + V.reshape(K // G, G, N)
            q = jnp.clip(_round_ste(raw), -qmax_s - 1, qmax_s)
            wq = q * scale[:, None, :]
        else:
            scale = (amax - amin) / qmax_u
            scale = jnp.where(scale <= 0, 1.0, scale)
            zero = jnp.round(-amin / scale)
            raw = wg / scale[:, None, :] + zero[:, None, :] + V.reshape(
                K // G, G, N)
            q = jnp.clip(_round_ste(raw), 0, qmax_u)
            wq = (q - zero[:, None, :]) * scale[:, None, :]
        return wq.reshape(K, N), scale, zero

    def loss_fn(params):
        V, a, b = params
        wq, _s, _z = make_qdq(V, a, b)
        return jnp.mean((X @ wq - Y) ** 2)

    V0 = jnp.zeros((K, N), jnp.float32)
    a0 = jnp.ones((K // G, N), jnp.float32)
    b0 = jnp.ones((K // G, N), jnp.float32)

    def step(i, params):
        V, a, b = params
        gV, ga, gb = jax.grad(loss_fn)((V, a, b))
        V = jnp.clip(V - lr * jnp.sign(gV), -0.5, 0.5)
        if enable_minmax:
            a = a - minmax_lr * jnp.sign(ga)
            b = b - minmax_lr * jnp.sign(gb)
        return V, a, b

    V, a, b = jax.lax.fori_loop(0, iters, step, (V0, a0, b0))
    wq, scale, zero = make_qdq(V, a, b)
    return wq, scale, (None if sym else zero - half)


def _round_ste(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


_ar_captures: dict[int, CalibCaptureState] = {}


@register_algo("autoround")
def autoround_entry(model, configs_mapping, mode="quantize", run_fn=None,
                    run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        blocks = find_target_blocks(model)
        assert blocks is not None, "AutoRound requires a block list"
        st = CalibCaptureState(model, *blocks)
        st.attach()
        _ar_captures[id(model)] = st
        return model
    if mode == "convert":
        st = _ar_captures.pop(id(model), None)
        assert st is not None, "convert() before prepare() for AutoRound"
        captured = st.detach()
        return _convert(model, st.block_paths, captured, configs_mapping)

    blocks = find_target_blocks(model)
    assert blocks is not None, "AutoRound requires a block list"
    st = CalibCaptureState(model, *blocks)
    captured = run_capture(model, st, run_fn, run_args)
    assert captured, "AutoRound calibration captured no batches"
    return _convert(model, st.block_paths, captured, configs_mapping)


def _convert(model, block_paths, captured, configs_mapping):
    cfg_by_name = {name: c for (name, _t), c in configs_mapping.items()}
    n_done = 0
    handled: set[str] = set()
    inputs = captured

    for bi, bpath in enumerate(block_paths):
        block = get_module(model, bpath)
        targets = {}
        for sub_path, sub in named_modules(block):
            if not sub_path:
                continue
            cfg = cfg_by_name.get(f"{bpath}.{sub_path}")
            if cfg is None or cfg.dtype in _FLOAT_SKIP:
                continue
            if extract_linear(sub) is None:
                continue
            targets[sub_path] = cfg
            handled.add(f"{bpath}.{sub_path}")
        if targets:
            for sub_path in targets:
                sub = get_module(block, sub_path)
                k, _ = extract_linear(sub)
                replace_module(block, sub_path, ActStatObserver(sub, k.shape[0]))
            for args, kwargs in inputs:
                block(*args, **kwargs)
            stats = {}
            for sub_path in list(targets):
                obs = get_module(block, sub_path)
                sample = obs.sample()
                replace_module(block, sub_path, obs.inner)
                if sample is None:
                    logger.warning(
                        "AutoRound: %s.%s received no calibration batches "
                        "— leaving it unquantized", bpath, sub_path)
                    del targets[sub_path]
                    continue
                stats[sub_path] = sample

            for c, cfg in targets.items():
                sub = get_module(block, c)
                kernel, bias = extract_linear(sub)
                K, N = kernel.shape
                G = cfg.group_size if cfg.group_size > 0 else K
                if K % G:
                    G = K
                X = stats[c]
                wq, scales, zeros = autoround_optimize(
                    X, kernel, bits=cfg.weight_bits, G=G, sym=cfg.use_sym,
                    iters=cfg.iters, lr=float(cfg.lr),
                    minmax_lr=float(cfg.minmax_lr),
                    enable_minmax=cfg.enable_minmax_tuning)
                codes = quantize_with_scale(wq, scales, zeros,
                                            cfg.weight_bits, G,
                                            scheme=cfg.scheme)
                qt = QTensor(codes, scales, zeros, "int", cfg.weight_bits, G,
                             (K, N))
                replace_module(block, c, WOQLinear.from_qtensor(qt, bias=bias))
                n_done += 1

        if bi + 1 < len(block_paths):
            inputs = [(_as_next_input(block(*args, **kwargs), args), kwargs)
                      for args, kwargs in inputs]

    # mapped ops OUTSIDE the decoder block list (lm_head with
    # quant_lm_head=True; vision tower / projector with
    # quant_nontext_module=True): the block-wise signed-grad optimization
    # has no input sample for them — quantize with RTN rounding instead of
    # silently skipping, and say so
    n_rtn = 0
    for name, cfg in cfg_by_name.items():
        if name in handled or cfg.dtype in _FLOAT_SKIP:
            continue
        try:
            mod = get_module(model, name)
        except (AttributeError, KeyError, IndexError):
            continue
        lin = extract_linear(mod)
        if lin is None:
            continue
        from .rtn import rtn_quantize_kernel

        kernel, bias = lin
        qt = rtn_quantize_kernel(kernel, cfg)
        replace_module(model, name, WOQLinear.from_qtensor(qt, bias=bias))
        n_rtn += 1
    if n_rtn:
        logger.warning(
            "AutoRound: %d mapped op(s) live outside the decoder block "
            "list (lm_head / non-text modules) — quantized with RTN "
            "rounding (no block input sample for the signed-grad "
            "optimization)", n_rtn)
    logger.info("AutoRound quantized %d Linear ops (+%d RTN outside "
                "blocks)", n_done, n_rtn)
    dump_op_stats(model)
    return model
