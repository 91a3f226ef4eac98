"""Quantized convolution / general-linear modules (NNX).

TPU-native analogs of the reference's non-Linear op quantization: Conv2d in
torch static quant (torch/algorithms/static_quant/), the TF Keras conv
layers (tensorflow/keras/layers/conv2d.py, depthwise_conv2d.py), and the
JAX frontend's Conv2D / EinsumDense / MultiHeadAttention static path
(jax/quantization/layers_static.py:681-770).

TPU redesign: the conv kernel [kh, kw, cin, cout] is quantized as a
[K = kh·kw·cin, N = cout] matrix (quantization groups run along K, the
architecture invariant), stored packed; the forward dequantizes into the
conv's operand stream (XLA fuses the unpack+scale into the convolution's
HBM read) and runs ``lax.conv_general_dilated`` on the MXU. Static W8A8
runs the conv itself in int8×int8 → int32 (MXU-native, probed on v5e).

``WOQLinearGeneral`` covers ``nnx.LinearGeneral`` — the projection type
inside ``nnx.MultiHeadAttention`` — by flattening the contraction /
output dims around the same packed [K, N] storage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..ops.packing import PackedWeight, dequantize_packed
from .woq_linear import WOQLinear


class ConvSpec(NamedTuple):
    """Static conv hyperparameters, canonicalized for
    ``lax.conv_general_dilated`` (NHWC / HWIO)."""

    kernel_shape: tuple[int, ...]   # (kh, kw, cin_per_group, cout)
    strides: tuple[int, ...]
    padding: str | tuple[tuple[int, int], ...]
    input_dilation: tuple[int, ...]
    kernel_dilation: tuple[int, ...]
    feature_group_count: int

    @property
    def spatial_rank(self) -> int:
        return len(self.kernel_shape) - 2

    def dimension_numbers(self):
        # flax's convention for any spatial rank: N, spatial..., C
        nd = self.spatial_rank
        sp = "".join("DHW"[3 - nd + i] for i in range(nd))
        return (f"N{sp}C", f"{sp}IO", f"N{sp}C")


def _tup(v, nd: int, name: str) -> tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * nd
    t = tuple(int(x) for x in v)
    assert len(t) == nd, f"{name}={v!r} does not match spatial rank {nd}"
    return t


def conv_spec_of(conv) -> ConvSpec:
    """Extract a ``ConvSpec`` from an ``nnx.Conv``. Raises loudly on
    settings the quantized module does not implement (masked kernels,
    circular padding) instead of silently mis-serving them."""
    kshape = tuple(conv.kernel[...].shape)
    nd = len(kshape) - 2
    if getattr(conv, "mask", None) is not None:
        raise NotImplementedError("quantized Conv does not support mask")
    padding = conv.padding
    if isinstance(padding, str):
        padding = padding.upper()
        if padding not in ("SAME", "VALID"):
            raise NotImplementedError(
                f"quantized Conv does not support padding={conv.padding!r}")
    elif isinstance(padding, int):
        padding = ((padding, padding),) * nd
    else:
        pads = []
        for p in padding:
            pads.append((p, p) if isinstance(p, int)
                        else (int(p[0]), int(p[1])))
        padding = tuple(pads)
        assert len(padding) == nd
    return ConvSpec(
        kernel_shape=kshape,
        strides=_tup(conv.strides, nd, "strides"),
        padding=padding,
        input_dilation=_tup(getattr(conv, "input_dilation", 1) or 1, nd,
                            "input_dilation"),
        kernel_dilation=_tup(getattr(conv, "kernel_dilation", 1) or 1, nd,
                             "kernel_dilation"),
        feature_group_count=int(getattr(conv, "feature_group_count", 1)),
    )


def flatten_conv_kernel(kernel: jax.Array) -> jax.Array:
    """[kh, kw, cin, cout] -> [kh·kw·cin, cout] (quant groups along K)."""
    return kernel.reshape(-1, kernel.shape[-1])


def _run_conv(x, w, spec: ConvSpec, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=spec.strides, padding=spec.padding,
        lhs_dilation=spec.input_dilation, rhs_dilation=spec.kernel_dilation,
        dimension_numbers=spec.dimension_numbers(),
        feature_group_count=spec.feature_group_count,
        preferred_element_type=preferred)


class WOQConv(WOQLinear):
    """Packed weight-only-quantized convolution.

    Storage is identical to ``WOQLinear`` over the flattened [K, N] kernel;
    the forward dequantizes (XLA fuses the unpack into the conv's weight
    stream) and runs the convolution on the MXU in the activation dtype.
    """

    def __init__(self, pw: PackedWeight, spec: ConvSpec,
                 bias: jax.Array | None = None):
        assert pw.orig_shape[1] == spec.kernel_shape[-1], (
            pw.orig_shape, spec.kernel_shape)
        super().__init__(pw, bias=bias)
        self.conv_spec = spec

    def __call__(self, x: jax.Array) -> jax.Array:
        w = dequantize_packed(self.packed_weight(), out_dtype=x.dtype)
        y = _run_conv(x, w.reshape(self.conv_spec.kernel_shape),
                      self.conv_spec)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y


class StaticQuantConv(nnx.Module):
    """W8A8 convolution with a calibrated per-tensor activation scale.

    Weight: per-output-channel symmetric int8 (scale over kh·kw·cin).
    The conv runs int8×int8 → int32 on the MXU, then rescales — the conv
    analog of ``StaticQuantLinear`` (reference Conv2d static quant,
    torch/algorithms/static_quant/; Keras QConv2D,
    tensorflow/keras/layers/conv2d.py).
    """

    def __init__(self, kernel: jax.Array, act_scale: jax.Array,
                 spec: ConvSpec, bias: jax.Array | None = None):
        self.conv_spec = spec
        wf = kernel.astype(jnp.float32).reshape(spec.kernel_shape)
        act_scale = jnp.asarray(act_scale, dtype=jnp.float32)
        assert act_scale.ndim == 0, (
            "StaticQuantConv supports per-tensor activation scales only")
        # per-output-channel scales: reduce every axis but cout (kernels
        # are [*, cin, cout] at any spatial rank, not just 2D)
        w_scale = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1))) / 127.0
        w_scale = jnp.where(w_scale <= 0, 1.0, w_scale)
        self.w_int8 = nnx.Param(jnp.clip(
            jnp.round(wf / w_scale), -128, 127).astype(jnp.int8))
        self.w_scale = nnx.Param(w_scale)
        self.act_scale = nnx.Param(act_scale)
        self.bias = nnx.Param(bias) if bias is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.act_scale[...]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                      -128, 127).astype(jnp.int8)
        acc = _run_conv(xq, self.w_int8[...], self.conv_spec,
                        preferred=jnp.int32)
        y = acc.astype(jnp.float32) * (s * self.w_scale[...])
        if self.bias is not None:
            y = y + self.bias[...].astype(jnp.float32)
        return y.astype(x.dtype)


class WOQLinearGeneral(WOQLinear):
    """Packed WOQ ``nnx.LinearGeneral`` (the projections inside
    ``nnx.MultiHeadAttention``): kernel [*in_dims, *out_dims] contracted
    over the trailing input axes, flattened to [K = prod(in),
    N = prod(out)] packed storage; the forward reshapes around the shared
    fused dequant-matmul kernels."""

    def __init__(self, pw: PackedWeight, out_shape: tuple[int, ...],
                 n_in_dims: int, bias: jax.Array | None = None):
        super().__init__(pw, bias=None)
        self.out_shape = tuple(out_shape)
        self.n_in_dims = int(n_in_dims)
        # bias keeps the LinearGeneral's own [*out_dims] shape
        self.bias_g = nnx.Param(bias) if bias is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        lead = x.shape[: x.ndim - self.n_in_dims]
        x2 = x.reshape(*lead, -1)
        assert x2.shape[-1] == self.in_features, (
            f"input contraction dims {x.shape[x.ndim - self.n_in_dims:]} "
            f"!= quantized K={self.in_features}")
        y = super().__call__(x2)
        y = y.reshape(*lead, *self.out_shape)
        if self.bias_g is not None:
            y = y + self.bias_g[...].astype(y.dtype)
        return y


def linear_general_qmatrix(lg) -> tuple[jax.Array, jax.Array | None,
                                        tuple[int, ...], int]:
    """Flatten an ``nnx.LinearGeneral``'s kernel to the [K, N] quantization
    view. Returns (kernel2d, bias, out_shape, n_in_dims). Raises on batch
    axes or non-trailing contraction axes (not produced by the zoo)."""
    if getattr(lg, "batch_axis", None):
        raise NotImplementedError(
            "quantized LinearGeneral does not support batch_axis")
    import math

    in_shape = tuple(lg.in_features)
    out_shape = tuple(lg.out_features)
    axis = tuple(lg.axis)
    # contraction must be the trailing input axes: axis normalized to
    # (-n, ..., -1) — nnx.MultiHeadAttention uses (-1,) and (-2, -1)
    n_in = len(axis)
    if sorted(axis) != list(range(-n_in, 0)):
        raise NotImplementedError(
            f"quantized LinearGeneral needs trailing contraction axes, "
            f"got axis={axis}")
    kernel = lg.kernel[...]
    assert kernel.shape == in_shape + out_shape, (
        kernel.shape, in_shape, out_shape)
    k2 = kernel.reshape(math.prod(in_shape), -1)
    bias = None if lg.bias is None else lg.bias[...]
    return k2, bias, out_shape, n_in
