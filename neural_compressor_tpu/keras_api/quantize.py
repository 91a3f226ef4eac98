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


def _dense_layers(model):
    import keras

    out = []
    types = (keras.layers.Dense, keras.layers.EinsumDense,
             keras.layers.Conv2D, keras.layers.DepthwiseConv2D)
    for layer in model._flatten_layers(include_self=False):
        if isinstance(layer, types):
            out.append(layer)
    return out


def _mapped_layers(model, quant_config):
    """Resolve per-layer configs through the standard op-mapping machinery
    (white_list, set_local overrides, quant_lm_head all apply)."""
    layers = _dense_layers(model)
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
    from ..quantization.config import INT8StaticQuantConfig, _WOQBase

    assert keras.backend.backend() == "jax", "set KERAS_BACKEND=jax"
    if not inplace:
        weights = model.get_weights()
        model = keras.models.clone_model(model)
        model.set_weights(weights)  # clone_model re-initializes params

    targets = _mapped_layers(model, quant_config)
    if isinstance(quant_config, _WOQBase):
        n = 0
        for layer, cfg in targets:
            k = layer.kernel
            w = jnp.asarray(np.asarray(k))
            shape = w.shape
            w2 = w.reshape(-1, shape[-1]) if w.ndim > 2 else w
            wq = qdq_tensor(w2, bits=cfg.weight_bits,
                            group_size=cfg.group_size,
                            scheme=cfg.scheme,
                            dtype=cfg.weight_dtype,
                            full_range=getattr(cfg, "use_full_range", False))
            layer.kernel.assign(np.asarray(wq.reshape(shape)))
            n += 1
        logger.info("Keras: QDQ'd %d Dense kernels (%s)", n,
                    quant_config.dtype)
        return model

    if isinstance(quant_config, INT8StaticQuantConfig):
        if calib_function is None:
            raise ValueError("static quant needs a calib_function "
                             "(an eager forward: lambda m: m(x))")
        # calibration: wrap call to record input stats
        stats: dict[int, _ActStats] = {}
        originals = {}

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

        layer_cfgs = dict((id(l), c) for l, c in targets)
        wrapped = [l for l, _c in targets]
        for layer in wrapped:
            originals[id(layer)] = layer.call
            layer.call = make_observer(layer)
        try:
            calib_function(model)
        finally:
            # never leave observer closures on the (in-place) model
            for layer in wrapped:
                layer.call = originals[id(layer)]

        # convert: QDQ each layer's kernel in place (per-out-channel for
        # Dense/Conv2D; per-tensor for EinsumDense/DepthwiseConv2D — their
        # kernel layouts have no single output axis to scale along), then
        # rebuild the graph with the SAVE-ABLE ``QDQActWrapper`` in front
        # of each converted layer (reference saves its quantized wrappers,
        # jax/quantization/saving.py:134-457)
        from .qlayers import register

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
            kernel = getattr(layer, "kernel", None)
            if kernel is None:
                logger.warning(
                    "Keras static quant: %s (%s) has no `kernel` — left "
                    "unquantized", layer.name, type(layer).__name__)
                continue
            cfg = layer_cfgs[id(layer)]
            w = np.asarray(kernel)
            if isinstance(layer, (keras.layers.Dense, keras.layers.Conv2D)) \
                    and not isinstance(layer, keras.layers.DepthwiseConv2D):
                axes = tuple(range(w.ndim - 1))  # per-out-channel
            else:
                axes = tuple(range(w.ndim))  # per-tensor
            w_scale = np.maximum(np.abs(w).max(axis=axes, keepdims=True)
                                 / 127.0, 1e-12)
            w_int = np.clip(np.round(w / w_scale), -128, 127)
            kernel.assign((w_int * w_scale).astype(w.dtype))
            amax = stats[id(layer)].clip_amax(
                getattr(cfg, "act_algo", "minmax"),
                getattr(cfg, "percentile", 99.99))
            act_scale_of[id(layer)] = max(amax / 127.0, 1e-12)
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

    raise TypeError(f"unsupported config for the Keras adapter: "
                    f"{type(quant_config).__name__}")
