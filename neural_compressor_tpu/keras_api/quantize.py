"""Keras-3 (JAX backend) frontend adapter.

Parity target: the reference's JAX/Keras-3 frontend
(neural_compressor/jax/quantization/quantize.py:42-71 ``quantize_model``,
class-swap mixins layers_static.py:438-770, MinMaxObserver calibration).

TPU redesign: no class swapping. Weight-only configs QDQ the Dense /
EinsumDense kernels **in place** (the model remains a plain Keras model —
saving, serving, and `keras.export` work untouched). Static W8A8 runs a
functional calibration pass (record per-layer input maxabs by wrapping
``layer.call``) and swaps in a serving-math QDQ closure, mirroring the
reference's ``call_int8`` path.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..common import logger
from ..common.config import BaseConfig


def _dense_layers(model):
    import keras

    out = []
    for layer in model._flatten_layers(include_self=False):
        if isinstance(layer, (keras.layers.Dense, keras.layers.EinsumDense)):
            out.append(layer)
    return out


def quantize_model(model, quant_config: BaseConfig,
                   calib_function: Callable | None = None,
                   inplace: bool = True):
    """Quantize a Keras-3 model per ``quant_config``.

    Weight-only configs (RTNConfig/...) QDQ the kernels in place. Static
    INT8 config additionally calibrates activations via ``calib_function``
    and swaps each layer's ``call`` to the W8A8 serving math.
    """
    import jax.numpy as jnp
    import keras

    from ..ops.qtensor import qdq_tensor
    from ..quantization.config import INT8StaticQuantConfig, _WOQBase

    assert keras.backend.backend() == "jax", "set KERAS_BACKEND=jax"
    if not inplace:
        model = keras.models.clone_model(model)

    layers = _dense_layers(model)
    if isinstance(quant_config, _WOQBase):
        n = 0
        for layer in layers:
            k = layer.kernel
            w = jnp.asarray(np.asarray(k))
            shape = w.shape
            w2 = w.reshape(-1, shape[-1]) if w.ndim > 2 else w
            wq = qdq_tensor(w2, bits=quant_config.weight_bits,
                            group_size=quant_config.group_size,
                            scheme=quant_config.scheme,
                            dtype=quant_config.weight_dtype)
            layer.kernel.assign(np.asarray(wq.reshape(shape)))
            n += 1
        logger.info("Keras: QDQ'd %d Dense kernels (%s)", n,
                    quant_config.dtype)
        return model

    if isinstance(quant_config, INT8StaticQuantConfig):
        # calibration: wrap call to record input amax
        stats = {}
        originals = {}

        def make_observer(layer):
            def observed(x, *a, **kw):
                amax = float(np.max(np.abs(np.asarray(x))))
                stats[id(layer)] = max(stats.get(id(layer), 0.0), amax)
                return originals[id(layer)](x, *a, **kw)

            return observed

        for layer in layers:
            originals[id(layer)] = layer.call
            layer.call = make_observer(layer)
        assert calib_function is not None, "static quant needs calibration"
        calib_function(model)
        for layer in layers:
            layer.call = originals[id(layer)]

        # convert: per-channel int8 weights + per-tensor act scale closure
        n = 0
        for layer in layers:
            if id(layer) not in stats or not isinstance(
                    layer, keras.layers.Dense):
                continue
            w = np.asarray(layer.kernel)
            w_scale = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-12)
            w_int = np.clip(np.round(w / w_scale), -128, 127)
            layer.kernel.assign((w_int * w_scale).astype(w.dtype))
            a_scale = max(stats[id(layer)] / 127.0, 1e-12)
            _orig = originals[id(layer)]

            def call_int8(x, _l=layer, _s=a_scale, _o=_orig):
                import jax.numpy as jnp

                xq = jnp.clip(jnp.round(x / _s), -128, 127) * _s
                return _o(xq)

            layer.call = call_int8
            n += 1
        logger.info("Keras: static-int8 converted %d Dense layers", n)
        return model

    raise TypeError(f"unsupported config for the Keras adapter: "
                    f"{type(quant_config).__name__}")
