"""Save-able Keras-3 quantized-layer representation.

Parity target: the reference's JAX/Keras saving wrappers
(neural_compressor/jax/quantization/saving.py:134-457 serializes its
quantized mixins so ``keras.save``/``load_model`` round-trip). TPU
redesign: ONE registered wrapper layer — ``QDQActWrapper`` — that holds
the calibrated per-tensor activation scale and nests the original layer
(whose kernel was QDQ'd in place at convert time). Nesting means every
quantizable layer type (Dense / EinsumDense / Conv2D / DepthwiseConv2D)
serializes through Keras's own layer serialization; no per-type wrapper
zoo."""

from __future__ import annotations


def _keras():
    import keras

    return keras


def register():
    """Define + register the wrapper lazily (keras import stays optional)."""
    keras = _keras()
    global QDQActWrapper
    if "QDQActWrapper" in globals() and QDQActWrapper is not None:
        return QDQActWrapper

    @keras.saving.register_keras_serializable(
        package="neural_compressor_tpu")
    class QDQActWrapper(keras.layers.Layer):
        """Static-int8 activation QDQ in front of a nested layer whose
        kernel is already QDQ'd: the save-able form of the Keras static
        W8A8 path."""

        def __init__(self, inner, act_scale: float, **kwargs):
            super().__init__(**kwargs)
            self.inner = inner
            self.act_scale = float(act_scale)

        def build(self, input_shape):
            if not self.inner.built:
                self.inner.build(input_shape)
            super().build(input_shape)

        def call(self, x):
            ops = _keras().ops
            s = self.act_scale
            xq = ops.clip(ops.round(x / s), -128.0, 127.0) * s
            return self.inner(xq)

        def compute_output_shape(self, input_shape):
            return self.inner.compute_output_shape(input_shape)

        def get_config(self):
            cfg = super().get_config()
            cfg.update({
                "inner": _keras().layers.serialize(self.inner),
                "act_scale": self.act_scale,
            })
            return cfg

        @classmethod
        def from_config(cls, cfg):
            cfg = dict(cfg)
            inner = _keras().layers.deserialize(cfg.pop("inner"))
            return cls(inner, cfg.pop("act_scale"), **cfg)

    globals()["QDQActWrapper"] = QDQActWrapper
    return QDQActWrapper


def register_mha():
    """Registered static-quant MultiHeadAttention (lazy, like register()).

    Parity target: the reference's QStaticMultiHeadAttention
    (neural_compressor/jax/quantization/layers_static.py:770) — QDQ on
    the scaled query, key, attention probabilities (fixed [0, 1] range)
    and value inside ``_compute_attention``; the q/k/v/output projection
    EinsumDense sublayers are quantized by the normal Dense path. A
    subclass (not a class swap) so ``keras.save``/``load_model``
    round-trips through normal layer serialization."""
    keras = _keras()
    global QDQMultiHeadAttention
    if globals().get("QDQMultiHeadAttention") is not None:
        return QDQMultiHeadAttention

    @keras.saving.register_keras_serializable(
        package="neural_compressor_tpu")
    class QDQMultiHeadAttention(keras.layers.MultiHeadAttention):
        """MultiHeadAttention with static-int8 QDQ on the attention
        internals. ``attn_scales``: {"q": scale of the pre-scaled query,
        "k": key scale, "a": prob scale (1/127 for the fixed [0, 1]
        range), "v": value scale}; missing keys skip that QDQ point."""

        def __init__(self, *args, attn_scales=None, **kwargs):
            super().__init__(*args, **kwargs)
            self.attn_scales = dict(attn_scales or {})

        def _qdq(self, x, key: str):
            s = self.attn_scales.get(key)
            if s is None:
                return x
            ops = _keras().ops
            return ops.clip(ops.round(x / s), -128.0, 127.0) * s

        def _compute_attention(self, query, key, value,
                               attention_mask=None, training=None,
                               return_attention_scores=False):
            # always the explicit einsum path (the fused
            # ops.dot_product_attention has no QDQ insertion points)
            ops = _keras().ops
            query = ops.multiply(
                query, ops.cast(self._inverse_sqrt_key_dim, query.dtype))
            query = self._qdq(query, "q")
            key = self._qdq(key, "k")
            scores = ops.einsum(self._dot_product_equation, key, query)
            scores = self._masked_softmax(scores, attention_mask)
            probs = self._qdq(scores, "a")
            if self._dropout > 0.0:
                probs = self._dropout_layer(probs, training=training)
            value = self._qdq(value, "v")
            out = ops.einsum(self._combine_equation, probs, value)
            return out, scores

        def get_config(self):
            cfg = super().get_config()
            cfg["attn_scales"] = self.attn_scales
            return cfg

    globals()["QDQMultiHeadAttention"] = QDQMultiHeadAttention
    return QDQMultiHeadAttention


QDQActWrapper = None  # populated by register()
QDQMultiHeadAttention = None  # populated by register_mha()
