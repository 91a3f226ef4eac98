"""Activation-quantized and precision-converted Linear modules (NNX).

TPU-native analogs of: the reference's IPEX static-int8 path (W8A8, §2 row
20), DynamicQuantConfig path, Gaudi FP8 ``PatchedLinear``
(fp8_quant/_quant_common/helper_modules.py:249), and the fp16/bf16
``HalfPrecisionModuleWrapper`` (torch/algorithms/mixed_precision/
module_wrappers.py:22). All are jit-compiled matmul paths; INT8×INT8 uses
the MXU's native int8 dot via ``preferred_element_type=jnp.int32``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..ops.qtensor import quantize_act_per_token

_FP8_DTYPES = {
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}


def fp8_dtype(name: str):
    return _FP8_DTYPES[name]


class DynamicQuantLinear(nnx.Module):
    """W8A8 with per-token dynamic activation scales.

    Weight: per-channel symmetric int8. Act: per-token sym int8 computed on
    the fly. The matmul runs int8×int8 → int32 on the MXU, then rescales.
    """

    def __init__(self, kernel: jax.Array, bias: jax.Array | None = None,
                 act_bits: int = 8):
        K, N = kernel.shape
        self.in_features, self.out_features = K, N
        self.act_bits = act_bits
        wf = kernel.astype(jnp.float32)
        qmax = 127.0
        w_scale = jnp.max(jnp.abs(wf), axis=0) / qmax  # [N]
        w_scale = jnp.where(w_scale <= 0, 1.0, w_scale)
        self.w_int8 = nnx.Param(
            jnp.clip(jnp.round(wf / w_scale[None, :]), -128, 127).astype(jnp.int8))
        self.w_scale = nnx.Param(w_scale)
        self.bias = nnx.Param(bias) if bias is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, self.in_features)
        xq, x_scale = quantize_act_per_token(x2, bits=self.act_bits)
        acc = jax.lax.dot_general(
            xq, self.w_int8[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * x_scale * self.w_scale[...][None, :]
        if self.bias is not None:
            y = y + self.bias[...].astype(jnp.float32)
        return y.astype(x.dtype).reshape(*lead, self.out_features)


class StaticQuantLinear(nnx.Module):
    """W8A8 with static (calibrated) activation scale.

    ``act_scale`` may be a scalar (per-tensor) or a [K] vector
    (per-channel): per-channel scales fold into the weight rows before
    weight quantization, so the int8 dot itself is unchanged
    (y = Σ (x_k/s_k)·(w_kn·s_k))."""

    def __init__(self, kernel: jax.Array, act_scale: jax.Array,
                 bias: jax.Array | None = None,
                 act_zero_point: jax.Array | None = None):
        K, N = kernel.shape
        self.in_features, self.out_features = K, N
        wf = kernel.astype(jnp.float32)
        act_scale = jnp.asarray(act_scale, dtype=jnp.float32)
        self.act_per_channel = act_scale.ndim == 1
        if self.act_per_channel:
            assert act_zero_point is None, \
                "per-channel static act scales are symmetric-only"
            wf = wf * act_scale[:, None]
        w_scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
        w_scale = jnp.where(w_scale <= 0, 1.0, w_scale)
        w_int8 = jnp.clip(jnp.round(wf / w_scale[None, :]),
                          -128, 127).astype(jnp.int8)
        self.w_int8 = nnx.Param(w_int8)
        self.w_scale = nnx.Param(w_scale)
        self.act_scale = nnx.Param(act_scale)
        self.act_zp = (nnx.Param(jnp.asarray(act_zero_point, dtype=jnp.float32))
                       if act_zero_point is not None else None)
        # zero-point correction needs Σ_k w_int8 — a K·N reduction over
        # constant data; precomputed so decode doesn't re-read the whole
        # int8 weight from HBM a second time every call
        self.w_colsum = (nnx.Variable(jnp.sum(
            w_int8.astype(jnp.int32), axis=0).astype(jnp.float32))
            if act_zero_point is not None else None)
        self.bias = nnx.Param(bias) if bias is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, self.in_features).astype(jnp.float32)
        s = self.act_scale[...]
        xq = x2 / (s[None, :] if self.act_per_channel else s)
        if self.act_zp is not None:
            xq = xq + self.act_zp[...]
        xq = jnp.clip(jnp.round(xq), -128, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, self.w_int8[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        if self.act_zp is not None:
            zp_corr = self.act_zp[...] * self.w_colsum[...]
            acc = acc - zp_corr[None, :]
        if self.act_per_channel:
            y = acc * self.w_scale[...][None, :]  # act scales live in W
        else:
            y = acc * s * self.w_scale[...][None, :]
        if self.bias is not None:
            y = y + self.bias[...].astype(jnp.float32)
        return y.astype(x.dtype).reshape(*lead, self.out_features)


class FP8Linear(nnx.Module):
    """FP8 (e4m3/e5m2) Linear with static scales.

    Weight is stored in fp8; activation is scaled and cast to fp8 at call
    time, the dot runs on fp8 inputs with f32 accumulation (XLA native fp8
    dot on TPU v5+; numerically emulated elsewhere). Scales follow the
    maxabs-over-fp8-max convention with optional pow2 (HW-aligned) rounding
    — reference scale methods, fp8_quant/_core/scale_methods.
    """

    def __init__(self, kernel: jax.Array, act_amax: jax.Array,
                 bias: jax.Array | None = None, dtype_name: str = "fp8_e4m3",
                 pow2_scales: bool = True, per_channel_weight: bool = False,
                 act_dynamic: bool = False, scale_method: str | None = None):
        from ..algorithms.fp8_scales import ScaleMethod, resolve, round_scale

        if scale_method is not None:
            m = resolve(scale_method)
        else:
            m = ScaleMethod(
                weight_granularity="pcs" if per_channel_weight else "pts",
                rounding="hw" if pow2_scales else "arbitrary",
                act_dynamic=act_dynamic)
        K, N = kernel.shape
        self.in_features, self.out_features = K, N
        self.dtype_name = dtype_name
        self.act_dynamic = m.act_dynamic
        # persisted so save/load rebuilds the same scale shapes/behavior
        self.scale_method = scale_method
        self.per_channel_weight = m.weight_granularity == "pcs"
        self.act_granularity = m.act_granularity
        fdt = fp8_dtype(dtype_name)
        fp8_max = float(jnp.finfo(fdt).max)
        wf = kernel.astype(jnp.float32)
        if m.opt_weight:
            from ..algorithms.fp8_scales import opt_weight_scale

            w_scale = round_scale(opt_weight_scale(wf, m, fdt, fp8_max), m)
        else:
            if m.weight_granularity == "pcs":
                w_amax = jnp.max(jnp.abs(wf), axis=0)  # [N]
            else:
                w_amax = jnp.max(jnp.abs(wf))
            w_scale = round_scale(w_amax / fp8_max, m)
        a_scale = round_scale(
            jnp.asarray(act_amax, dtype=jnp.float32) / fp8_max, m)
        self.w_fp8 = nnx.Param(
            jnp.clip(wf / w_scale, -fp8_max, fp8_max).astype(fdt))
        self.w_scale = nnx.Param(jnp.asarray(w_scale, dtype=jnp.float32))
        self.act_scale = nnx.Param(jnp.asarray(a_scale, dtype=jnp.float32))
        self.bias = nnx.Param(bias) if bias is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        fdt = fp8_dtype(self.dtype_name)
        fp8_max = float(jnp.finfo(fdt).max)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, self.in_features).astype(jnp.float32)
        if self.act_dynamic:
            # per-call scale (reference QuantDynamicInput,
            # _core/quant_dequant.py:115): pcs = per-token rows,
            # pts = one scale over the whole call
            if getattr(self, "act_granularity", "pcs") == "pts":
                s = jnp.max(jnp.abs(x2)) / fp8_max
            else:
                s = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / fp8_max
            s = jnp.where(s <= 0, 1.0, s)
        else:
            s = self.act_scale[...]
        # saturating cast: e4m3 has no inf — overflow would become NaN
        xq = jnp.clip(x2 / s, -fp8_max, fp8_max).astype(fdt)
        acc = jax.lax.dot_general(
            xq, self.w_fp8[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = acc * s * self.w_scale[...]
        if self.bias is not None:
            y = y + self.bias[...].astype(jnp.float32)
        return y.astype(x.dtype).reshape(*lead, self.out_features)


class HalfPrecisionLinear(nnx.Module):
    """bf16/fp16 converted Linear (mixed-precision fallback op)."""

    def __init__(self, kernel: jax.Array, bias: jax.Array | None = None,
                 dtype=jnp.bfloat16):
        self.in_features, self.out_features = kernel.shape
        self.dtype = dtype
        self.kernel = nnx.Param(kernel.astype(dtype))
        self.bias = nnx.Param(bias.astype(dtype)) if bias is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.dot(x.astype(self.dtype), self.kernel[...],
                    preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y.astype(x.dtype)
