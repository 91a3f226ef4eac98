"""TEQ — trainable equivalent transformation.

Parity target: reference TrainableEquivalentTransformation
(torch/algorithms/weight_only/teq.py:35): a per-input-channel scale vector
trained by gradient descent against the QDQ output loss, then absorbed into
the parent op (same absorb machinery as AWQ). TPU redesign: the training
loop is a jitted optax-adam ``lax.fori_loop`` over a captured input sample;
the QDQ gradient uses the straight-through estimator
(``w + stop_grad(qdq(w) − w)``)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..common import logger
from ..layers.module_utils import get_module, named_modules, replace_module
from ..layers.woq_linear import WOQLinear
from ..ops.qtensor import quantize_tensor
from . import register_algo
from .awq import (
    ActStatObserver,
    _absorb_groups_for_block,
    apply_absorb_fold,
    _qdq,
)
from .calib_capture import CalibCaptureState, find_target_blocks, run_capture
from .gptq import _as_next_input
from .utils import extract_linear, dump_op_stats

_FLOAT_SKIP = ("fp32", "bf16", "fp16")


def _qdq_ste(W, bits, group_size, scheme, wdtype):
    """Straight-through QDQ: forward = qdq(W), gradient = identity."""
    return W + jax.lax.stop_gradient(_qdq(W, bits, group_size, scheme,
                                          wdtype) - W)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "scheme", "wdtype", "steps", "lr"),
)
def teq_train_scale(X, Ws, *, bits, group_size, scheme, wdtype, steps=100,
                    lr=1e-3):
    """Train a per-channel scale vector minimizing the QDQ output MSE."""
    Y = X @ Ws
    tx = optax.adam(lr)

    def loss_fn(log_s):
        s = jnp.exp(log_s)
        Wq = _qdq_ste(Ws * s[:, None], bits, group_size, scheme, wdtype)
        return jnp.mean(((X / s[None, :]) @ Wq - Y) ** 2)

    log_s0 = jnp.zeros((Ws.shape[0],), jnp.float32)
    opt0 = tx.init(log_s0)

    def step(i, carry):
        log_s, opt = carry
        _loss, g = jax.value_and_grad(loss_fn)(log_s)
        upd, opt = tx.update(g, opt, log_s)
        return optax.apply_updates(log_s, upd), opt

    log_s, _ = jax.lax.fori_loop(0, steps, step, (log_s0, opt0))
    return jnp.exp(log_s)


_teq_captures: dict[int, CalibCaptureState] = {}


@register_algo("teq")
def teq_entry(model, configs_mapping, mode="quantize", run_fn=None,
              run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        blocks = find_target_blocks(model)
        assert blocks is not None, "TEQ requires a transformer block list"
        st = CalibCaptureState(model, *blocks)
        st.attach()
        _teq_captures[id(model)] = st
        return model
    if mode == "convert":
        st = _teq_captures.pop(id(model), None)
        assert st is not None, "convert() before prepare() for TEQ"
        captured = st.detach()
        return _convert(model, st.block_paths, captured, configs_mapping)

    blocks = find_target_blocks(model)
    assert blocks is not None, "TEQ requires a transformer block list"
    st = CalibCaptureState(model, *blocks)
    captured = run_capture(model, st, run_fn, run_args)
    assert captured, "TEQ calibration captured no batches"
    return _convert(model, st.block_paths, captured, configs_mapping)


def _convert(model, block_paths, captured, configs_mapping):
    cfg_by_name = {name: c for (name, _t), c in configs_mapping.items()}
    n_done = 0
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
                        "TEQ: %s.%s received no calibration batches — "
                        "leaving it unquantized", bpath, sub_path)
                    del targets[sub_path]
                    continue
                stats[sub_path] = (obs.amax[...], sample)

            any_cfg = next(iter(targets.values()))
            scale_of = {}
            for parent, children, kind in _absorb_groups_for_block(
                    block, bpath, any_cfg):
                members = [c for c in children if c in targets]
                if not members:
                    continue
                cfg = targets[members[0]]
                kernels = [extract_linear(get_module(block, c))[0]
                           .astype(jnp.float32) for c in members]
                Ws = jnp.concatenate(kernels, axis=1)
                _amax, X = stats[members[0]]
                s = teq_train_scale(
                    X, Ws, bits=cfg.weight_bits, group_size=cfg.group_size,
                    scheme=cfg.scheme, wdtype=cfg.weight_dtype,
                    steps=cfg.train_steps, lr=cfg.lr)

                pre_scale = None
                if not (cfg.folding and apply_absorb_fold(
                        block, parent, children, members, kind, s)):
                    pre_scale = s
                for c in members:
                    scale_of[c] = (s, pre_scale)

            for c, cfg in targets.items():
                sub = get_module(block, c)
                kernel, bias = extract_linear(sub)
                s, pre_scale = scale_of.get(
                    c, (jnp.ones((kernel.shape[0],), jnp.float32), None))
                Wsc = kernel.astype(jnp.float32) * s[:, None]
                qt = quantize_tensor(Wsc, bits=cfg.weight_bits,
                                     group_size=cfg.group_size,
                                     scheme=cfg.scheme, dtype=cfg.weight_dtype)
                replace_module(block, c, WOQLinear.from_qtensor(
                    qt, bias=bias, pre_scale=pre_scale))
                n_done += 1

        if bi + 1 < len(block_paths):
            inputs = [(_as_next_input(block(*args, **kwargs), args), kwargs)
                      for args, kwargs in inputs]

    logger.info("TEQ quantized %d Linear ops over %d blocks",
                n_done, len(block_paths))
    dump_op_stats(model)
    return model
