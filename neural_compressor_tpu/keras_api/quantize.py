"""Keras-3 (JAX backend) frontend adapter.

Parity target: the reference's JAX/Keras-3 frontend
(neural_compressor/jax/quantization/quantize.py:42-71 ``quantize_model``,
class-swap mixins layers_static.py:438-770, MinMaxObserver calibration).

TPU redesign: no class swapping. Weight-only configs QDQ the Dense /
EinsumDense kernels **in place** (the model remains a plain Keras model —
saving, serving, and `keras.export` work untouched). Static W8A8 runs a
functional calibration pass (record per-layer input stats by wrapping
``layer.call``) and swaps in a serving-math QDQ closure, mirroring the
reference's ``call_int8`` path.

Calibration is EAGER: ``calib_function`` must call the model directly
(``lambda m: m(x)``) — Keras's ``predict``/``fit`` trace the forward on the
JAX backend, where host-side stat capture is impossible (a clear error is
raised instead of a cryptic tracer crash).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..common import logger
from ..common.config import BaseConfig

# static log2 histogram for percentile/mse act calibration (np mirror of
# layers.observers.HistogramObserver — calibration here is eager/host-side)
_LOG2_MIN, _LOG2_MAX, _N_BINS = -24.0, 24.0, 512


def _dense_layers(model, include_static_ops: bool = False):
    import keras

    out = []
    types = (keras.layers.Dense, keras.layers.EinsumDense,
             keras.layers.Conv2D, keras.layers.DepthwiseConv2D,
             keras.layers.SeparableConv2D)
    if include_static_ops:
        # static W8A8 also QDQs pooling inputs (reference
        # tensorflow/keras/layers/pool2d.py) and attention internals
        # (jax/quantization/layers_static.py:770)
        types = types + (keras.layers.AveragePooling2D,
                         keras.layers.MaxPooling2D,
                         keras.layers.MultiHeadAttention)
    for layer in model._flatten_layers(include_self=False):
        if isinstance(layer, types):
            out.append(layer)
    return out


def _kernels_of(layer):
    """[(kernel_variable, per_out_channel)] for one layer — covers the
    two-kernel SeparableConv2D (depthwise per-tensor + pointwise
    per-out-channel; reference keras/layers/separable_conv2d.py keeps
    both quantized the same way)."""
    import keras

    if isinstance(layer, keras.layers.SeparableConv2D):
        return [(layer.depthwise_kernel, False),
                (layer.pointwise_kernel, True)]
    kernel = getattr(layer, "kernel", None)
    if kernel is None:
        return []
    per_channel = isinstance(
        layer, (keras.layers.Dense, keras.layers.Conv2D)) and \
        not isinstance(layer, keras.layers.DepthwiseConv2D)
    return [(kernel, per_channel)]


def _mapped_layers(model, quant_config, include_static_ops: bool = False):
    """Resolve per-layer configs through the standard op-mapping machinery
    (white_list, set_local overrides, quant_lm_head all apply)."""
    layers = _dense_layers(model, include_static_ops=include_static_ops)
    info = [(getattr(l, "path", None) or l.name, type(l).__name__)
            for l in layers]
    mapping = quant_config.to_config_mapping(info)
    out = []
    for layer, key in zip(layers, info):
        cfg = mapping.get(key)
        if cfg is not None:
            out.append((layer, cfg))
    return out


class _ActStats:
    """Running amax + log2-magnitude histogram of one layer's inputs."""

    def __init__(self):
        self.amax = 0.0
        self.counts = np.zeros((_N_BINS,), np.int64)

    def update(self, x: np.ndarray) -> None:
        xf = np.abs(np.asarray(x, np.float32)).reshape(-1)
        if xf.size == 0:
            return
        self.amax = max(self.amax, float(xf.max()))
        lg = np.log2(np.maximum(xf, 2.0 ** _LOG2_MIN))
        width = (_LOG2_MAX - _LOG2_MIN) / _N_BINS
        idx = np.clip(((lg - _LOG2_MIN) / width).astype(np.int64),
                      0, _N_BINS - 1)
        self.counts += np.bincount(idx, minlength=_N_BINS)

    def _bin_uppers(self):
        width = (_LOG2_MAX - _LOG2_MIN) / _N_BINS
        return np.exp2(_LOG2_MIN + width * (np.arange(_N_BINS) + 1.0))

    def clip_amax(self, algo: str, percentile: float, bits: int = 8):
        if algo in ("minmax", "maxabs", "max") or self.counts.sum() == 0:
            return self.amax
        uppers = self._bin_uppers()
        if algo == "percentile":
            cdf = np.cumsum(self.counts) / max(self.counts.sum(), 1)
            covered = np.nonzero(cdf >= percentile / 100.0)[0]
            clip = uppers[covered[0]] if covered.size else self.amax
            return min(float(clip), self.amax)
        if algo == "mse":
            qmax = 2.0 ** (bits - 1) - 1
            nz = self.counts > 0
            cand = np.concatenate([uppers[nz][-40:], [max(self.amax, 1e-12)]])
            best, best_err = cand[-1], np.inf
            for c in cand:
                step = c / qmax
                inside = np.minimum(uppers, c)
                err = float(np.sum(self.counts * (step * step / 12.0
                                                  + (uppers - inside) ** 2)))
                if err < best_err:
                    best, best_err = c, err
            return float(best)
        raise ValueError(f"unknown act_algo {algo!r}; expected "
                         "minmax | percentile | mse")


def _producer_of(layer):
    """The graph-level layer producing ``layer``'s (single) input, or
    None (subclassed models / multi-input layers have no usable graph)."""
    try:
        hist = layer.input._keras_history
    except Exception:
        return None
    return getattr(hist, "operation", None)


def _consumers_map(model):
    """producer-layer id -> set of consumer layers (functional graphs)."""
    out: dict[int, list] = {}
    for layer in model._flatten_layers(include_self=False):
        try:
            inputs = layer.input
        except Exception:
            continue
        tensors = inputs if isinstance(inputs, (list, tuple)) else [inputs]
        for t in tensors:
            hist = getattr(t, "_keras_history", None)
            op = getattr(hist, "operation", None)
            if op is not None:
                out.setdefault(id(op), []).append(layer)
    return out


def _smooth_quant_keras(model, cfg, calib_function):
    """SmoothQuant over Keras Dense stacks, then static W8A8.

    Parity target: the TF smoother (tensorflow/algorithms/smoother/) —
    s = amax_x^α / amax_w^(1-α) per input channel, folded into the
    producing LayerNormalization (γ, β) or Dense (kernel, bias). The
    fold only applies when EVERY consumer of the producer's output is a
    smoothed Dense (otherwise the graph would change for the others) and
    the producer's activation is scale-homogeneous (linear/relu);
    non-foldable Denses are skipped with a loud warning, exactly like
    the NNX path (algorithms/smooth_quant.py)."""
    import keras
    import numpy as np

    from ..quantization.config import INT8StaticQuantConfig

    dense = [(l, c) for l, c in _mapped_layers(model, cfg)
             if isinstance(l, keras.layers.Dense)]
    # per-channel input amax via eager call observers
    ch_amax: dict[int, np.ndarray] = {}
    originals = {}

    def make_observer(layer):
        def observed(x, *a, **kw):
            xa = np.abs(np.asarray(x, np.float32))
            amax = xa.reshape(-1, xa.shape[-1]).max(axis=0)
            prev = ch_amax.get(id(layer))
            ch_amax[id(layer)] = amax if prev is None else \
                np.maximum(prev, amax)
            return originals[id(layer)](x, *a, **kw)

        return observed

    for layer, _c in dense:
        originals[id(layer)] = layer.call
        layer.call = make_observer(layer)
    try:
        calib_function(model)
    finally:
        for layer, _c in dense:
            layer.call = originals[id(layer)]

    consumers = _consumers_map(model)
    by_producer: dict[int, list] = {}
    prod_of: dict[int, object] = {}
    for layer, _c in dense:
        if id(layer) not in ch_amax:
            continue
        prod = _producer_of(layer)
        if prod is not None:
            by_producer.setdefault(id(prod), []).append(layer)
            prod_of[id(prod)] = prod

    alpha = float(cfg.alpha if not isinstance(cfg.alpha, str) else 0.5)
    n_folded = 0
    for pid, group in by_producer.items():
        prod = prod_of[pid]
        cons = consumers.get(pid, [])
        if set(map(id, cons)) - set(map(id, group)):
            logger.warning(
                "Keras SmoothQuant: %s feeds non-smoothed consumers — "
                "scales for %s not folded (skipped)", prod.name,
                [l.name for l in group])
            continue
        if isinstance(prod, keras.layers.LayerNormalization):
            if not prod.scale:
                logger.warning("Keras SmoothQuant: %s has scale=False — "
                               "skipped", prod.name)
                continue
        elif isinstance(prod, keras.layers.Dense):
            act = getattr(prod.activation, "__name__", "linear")
            if act not in ("linear", "relu"):
                logger.warning(
                    "Keras SmoothQuant: %s activation %r is not scale-"
                    "homogeneous — skipped", prod.name, act)
                continue
        else:
            logger.warning(
                "Keras SmoothQuant: no foldable parent for %s (producer "
                "%s) — skipped", [l.name for l in group],
                type(prod).__name__)
            continue
        x_amax = np.maximum.reduce([ch_amax[id(l)] for l in group])
        w_amax = np.maximum.reduce(
            [np.abs(np.asarray(l.kernel)).max(axis=1) for l in group])
        s = np.power(np.maximum(x_amax, 1e-8), alpha) / np.power(
            np.maximum(w_amax, 1e-8), 1.0 - alpha)
        s = np.clip(s, 1e-4, 1e4).astype(np.float32)
        for layer in group:
            layer.kernel.assign(np.asarray(layer.kernel) * s[:, None])
        if isinstance(prod, keras.layers.LayerNormalization):
            prod.gamma.assign(np.asarray(prod.gamma) / s)
            if prod.center:
                prod.beta.assign(np.asarray(prod.beta) / s)
        else:
            prod.kernel.assign(np.asarray(prod.kernel) / s[None, :])
            if prod.use_bias:
                prod.bias.assign(np.asarray(prod.bias) / s)
        n_folded += len(group)
    logger.info("Keras SmoothQuant: folded scales into %d Dense layers "
                "(alpha=%.2f); running static W8A8 on the smoothed model",
                n_folded, alpha)
    return quantize_model(
        model,
        INT8StaticQuantConfig(white_list=cfg.white_list),
        calib_function=calib_function, inplace=True)


def quantize_model(model, quant_config: BaseConfig,
                   calib_function: Callable | None = None,
                   inplace: bool = True):
    """Quantize a Keras-3 model per ``quant_config``.

    Weight-only configs (RTNConfig/...) QDQ the kernels in place. Static
    INT8 config additionally calibrates activations via ``calib_function``
    (an EAGER forward: ``lambda m: m(x)``) and swaps each layer's ``call``
    to the W8A8 serving math.
    """
    import jax
    import jax.numpy as jnp
    import keras

    from ..ops.qtensor import qdq_tensor
    from ..quantization.config import (INT8StaticQuantConfig,
                                       SmoothQuantConfig, _WOQBase)

    assert keras.backend.backend() == "jax", "set KERAS_BACKEND=jax"
    if not inplace:
        weights = model.get_weights()
        model = keras.models.clone_model(model)
        model.set_weights(weights)  # clone_model re-initializes params

    if isinstance(quant_config, _WOQBase):
        targets = _mapped_layers(model, quant_config)
        n = 0
        for layer, cfg in targets:
            for kernel, _pc in _kernels_of(layer):
                w = jnp.asarray(np.asarray(kernel))
                shape = w.shape
                w2 = w.reshape(-1, shape[-1]) if w.ndim > 2 else w
                wq = qdq_tensor(w2, bits=cfg.weight_bits,
                                group_size=cfg.group_size,
                                scheme=cfg.scheme,
                                dtype=cfg.weight_dtype,
                                full_range=getattr(cfg, "use_full_range",
                                                   False))
                kernel.assign(np.asarray(wq.reshape(shape)))
                n += 1
        logger.info("Keras: QDQ'd %d kernels (%s)", n, quant_config.dtype)
        return model

    if isinstance(quant_config, INT8StaticQuantConfig):
        if calib_function is None:
            raise ValueError("static quant needs a calib_function "
                             "(an eager forward: lambda m: m(x))")
        targets = _mapped_layers(model, quant_config,
                                 include_static_ops=True)
        # calibration: wrap call to record input stats (plus the
        # attention internals for MultiHeadAttention)
        stats: dict[int, _ActStats] = {}
        attn_stats: dict[int, dict[str, _ActStats]] = {}
        originals = {}
        attn_originals = {}

        def make_observer(layer):
            def observed(x, *a, **kw):
                if isinstance(x, jax.core.Tracer):
                    raise RuntimeError(
                        "Keras static-quant calibration must run EAGERLY: "
                        "call the model directly (calib_function="
                        "lambda m: m(x)); model.predict/fit trace the "
                        "forward on the JAX backend, where input stats "
                        "cannot be captured")
                stats.setdefault(id(layer), _ActStats()).update(x)
                return originals[id(layer)](x, *a, **kw)

            return observed

        def make_attn_observer(layer):
            def observed(query, key, value, *a, **kw):
                rec = attn_stats.setdefault(
                    id(layer), {k: _ActStats() for k in ("q", "k", "v")})
                # q is recorded pre-scaled (the QDQ point is after the
                # 1/sqrt(dk) multiply — reference f_qdq convert() derives
                # one scale from the other the same way)
                rec["q"].update(np.asarray(query)
                                * float(layer._inverse_sqrt_key_dim))
                rec["k"].update(np.asarray(key))
                rec["v"].update(np.asarray(value))
                return attn_originals[id(layer)](query, key, value,
                                                 *a, **kw)

            return observed

        layer_cfgs = dict((id(l), c) for l, c in targets)
        mha_layers = [l for l, _c in targets
                      if isinstance(l, keras.layers.MultiHeadAttention)]
        wrapped = [l for l, _c in targets if l not in mha_layers]
        for layer in wrapped:
            originals[id(layer)] = layer.call
            layer.call = make_observer(layer)
        for layer in mha_layers:
            attn_originals[id(layer)] = layer._compute_attention
            layer._compute_attention = make_attn_observer(layer)
        try:
            calib_function(model)
        finally:
            # never leave observer closures on the (in-place) model
            for layer in wrapped:
                layer.call = originals[id(layer)]
            for layer in mha_layers:
                # remove the observer SHADOW rather than re-assigning the
                # bound method: an instance attribute would keep shadowing
                # _compute_attention after the QDQ class swap below
                layer.__dict__.pop("_compute_attention", None)

        # convert: QDQ each layer's kernel in place (per-out-channel for
        # Dense/Conv2D; per-tensor for EinsumDense/DepthwiseConv2D — their
        # kernel layouts have no single output axis to scale along), then
        # rebuild the graph with the SAVE-ABLE ``QDQActWrapper`` in front
        # of each converted layer (reference saves its quantized wrappers,
        # jax/quantization/saving.py:134-457)
        from .qlayers import register, register_mha

        QDQActWrapper = register()
        act_scale_of: dict[int, float] = {}
        n = 0
        for layer in wrapped:
            if id(layer) not in stats:
                logger.warning(
                    "Keras static quant: %s (%s) was mapped but never "
                    "called during calibration — left unquantized",
                    layer.name, type(layer).__name__)
                continue
            cfg = layer_cfgs[id(layer)]
            # pool2d layers have no kernels: input QDQ only (reference
            # keras/layers/pool2d.py QAvgPool2D/QMaxPool2D)
            for kernel, per_channel in _kernels_of(layer):
                w = np.asarray(kernel)
                axes = tuple(range(w.ndim - 1)) if per_channel \
                    else tuple(range(w.ndim))
                w_scale = np.maximum(np.abs(w).max(axis=axes, keepdims=True)
                                     / 127.0, 1e-12)
                w_int = np.clip(np.round(w / w_scale), -128, 127)
                kernel.assign((w_int * w_scale).astype(w.dtype))
            amax = stats[id(layer)].clip_amax(
                getattr(cfg, "act_algo", "minmax"),
                getattr(cfg, "percentile", 99.99))
            act_scale_of[id(layer)] = max(amax / 127.0, 1e-12)
            n += 1

        # MultiHeadAttention: in-place class swap to the registered
        # subclass with QDQ on scaled-q / k / probs / v (probs use the
        # fixed [0, 1] range — reference a_qdq fixed_range=(0.0, 1.0))
        QDQMultiHeadAttention = register_mha()
        for layer in mha_layers:
            rec = attn_stats.get(id(layer))
            if rec is None:
                logger.warning(
                    "Keras static quant: %s (MultiHeadAttention) never "
                    "attended during calibration — left unquantized",
                    layer.name)
                continue
            cfg = layer_cfgs[id(layer)]
            algo = getattr(cfg, "act_algo", "minmax")
            pct = getattr(cfg, "percentile", 99.99)
            scales = {k: max(rec[k].clip_amax(algo, pct) / 127.0, 1e-12)
                      for k in ("q", "k", "v")}
            scales["a"] = 1.0 / 127.0
            layer._tracker.unlock()
            layer.__class__ = QDQMultiHeadAttention
            layer.attn_scales = scales
            layer._tracker.lock()
            n += 1

        def clone_fn(layer):
            s = act_scale_of.get(id(layer))
            if s is None:
                return layer  # reuse the instance — weights carry over
            return QDQActWrapper(layer, s, name=f"{layer.name}_qdq")

        try:
            qmodel = keras.models.clone_model(model, clone_function=clone_fn)
        except (ValueError, TypeError) as e:
            # subclassed models can't be graph-rebuilt: serve via call
            # closures (NOT save-able — keras.save drops the act QDQ)
            logger.warning(
                "Keras static quant: cannot rebuild the model graph with "
                "save-able QDQ wrappers (%s); falling back to in-place "
                "call closures — keras.save will NOT retain the "
                "activation QDQ on this model", e)
            for layer in wrapped:
                s = act_scale_of.get(id(layer))
                if s is None:
                    continue

                def call_int8(x, _s=s, _o=originals[id(layer)]):
                    import jax.numpy as jnp

                    xq = jnp.clip(jnp.round(x / _s), -128, 127) * _s
                    return _o(xq)

                layer.call = call_int8
            qmodel = model
        logger.info("Keras: static-int8 converted %d layers (%s act "
                    "calibration)", n,
                    getattr(quant_config, "act_algo", "minmax"))
        return qmodel

    if isinstance(quant_config, SmoothQuantConfig):
        if calib_function is None:
            raise ValueError("SmoothQuant needs a calib_function "
                             "(an eager forward: lambda m: m(x))")
        return _smooth_quant_keras(model, quant_config, calib_function)

    raise TypeError(f"unsupported config for the Keras adapter: "
                    f"{type(quant_config).__name__}")
