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


QDQActWrapper = None  # populated by register()
