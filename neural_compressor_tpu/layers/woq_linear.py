"""Weight-only-quantized Linear modules (NNX).

``WOQLinear`` — serving module holding the packed weight; forward runs the
fused Pallas dequant-matmul (TPU-native replacement of the reference's
``INCWeightOnlyLinear``/``HPUWeightOnlyLinear``,
neural_compressor/torch/algorithms/weight_only/modules.py:157-754).

``QDQLinear`` — fake-quant (QDQ) Linear keeping a dequantized bf16 kernel;
used for accuracy emulation and as the numerically-exact reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..kernels import woq_matmul
from ..ops.packing import PackedWeight, pack_qtensor, dequantize_packed
from ..ops.qtensor import QTensor, quantize_tensor


class WOQLinear(nnx.Module):
    """Packed weight-only-quantized Linear: ``y = x @ dequant(Wq) + b``."""

    def __init__(self, pw: PackedWeight, bias: jax.Array | None = None,
                 impl: str = "auto", pre_scale: jax.Array | None = None):
        K, N = pw.orig_shape
        self.in_features = K
        self.out_features = N
        self.bits = pw.bits
        self.group_size = pw.group_size
        self.wdtype = pw.dtype
        self.layout = pw.layout
        self.impl = impl
        # multi-chip serving: set by models.sharding.enable_tp_serving —
        # ("column"|"row", mesh_axis, data_axis) + the mesh (static attrs)
        self.tp_role = None
        self.tp_mesh = None
        self.packed = nnx.Param(pw.packed)
        self.scales = nnx.Param(pw.scales)
        self.zeros = nnx.Param(pw.zeros) if pw.zeros is not None else None
        # act-order / GAR input-row permutation (rows stored permuted)
        self.perm = nnx.Param(pw.perm) if pw.perm is not None else None
        # double-quant: scales are int8 codes, these are their meta
        self.sq_scales = (nnx.Param(pw.sq_scales)
                          if pw.sq_scales is not None else None)
        self.sq_zeros = (nnx.Param(pw.sq_zeros)
                         if pw.sq_zeros is not None else None)
        self.bias = nnx.Param(bias) if bias is not None else None
        # AWQ/SmoothQuant per-input-channel scale that could not be folded
        # into a parent op: forward computes (x / pre_scale) @ dequant(Wq·s)
        self.pre_scale = (nnx.Param(pre_scale.astype(jnp.float32))
                          if pre_scale is not None else None)

    def packed_weight(self) -> PackedWeight:
        return PackedWeight(
            packed=self.packed[...],
            scales=self.scales[...],
            zeros=None if self.zeros is None else self.zeros[...],
            bits=self.bits,
            group_size=self.group_size,
            dtype=self.wdtype,
            orig_shape=(self.in_features, self.out_features),
            layout=self.layout,
            perm=None if self.perm is None else self.perm[...],
            sq_scales=(None if self.sq_scales is None
                       else self.sq_scales[...]),
            sq_zeros=None if self.sq_zeros is None else self.sq_zeros[...],
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pre_scale is not None:
            x = x / self.pre_scale[...].astype(x.dtype)
        if self.tp_role is not None:
            from ..kernels.tp_matmul import (tp_woq_matmul_column,
                                             tp_woq_matmul_row)

            kind, axis, data_axis = self.tp_role
            fn = (tp_woq_matmul_column if kind == "column"
                  else tp_woq_matmul_row)
            y = fn(x, self.packed_weight(), self.tp_mesh, axis=axis,
                   data_axis=data_axis)
        else:
            y = woq_matmul(x, self.packed_weight(), impl=self.impl)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y

    def dequantized_kernel(self, dtype=jnp.float32) -> jax.Array:
        return dequantize_packed(self.packed_weight(), out_dtype=dtype)

    @classmethod
    def from_qtensor(cls, qt: QTensor, bias=None, impl: str = "auto",
                     pre_scale=None, perm=None) -> "WOQLinear":
        return cls(pack_qtensor(qt, perm=perm), bias=bias, impl=impl,
                   pre_scale=pre_scale)

    @classmethod
    def from_kernel(cls, kernel: jax.Array, bias=None, *, bits=4,
                    group_size=32, scheme="sym", dtype="int",
                    impl: str = "auto") -> "WOQLinear":
        qt = quantize_tensor(kernel, bits=bits, group_size=group_size,
                             scheme=scheme, dtype=dtype)
        return cls.from_qtensor(qt, bias=bias, impl=impl)


class W4A8Linear(WOQLinear):
    """INT4-weight x INT8-activation serving Linear (reference
    ``HPUMixedPrecisionLinear``, mixed_low_precision/modules.py:31).

    The int8-MXU kernel wins at EVERY M on v5e once the K-tile is the
    largest group-multiple dividing K (experiments/w4a8_m1.log, M=1:
    286 vs 415 us/layer against the all-integer VPU matvec; the M-tile
    pads to the int8 sublane, irrelevant in the weights-bound regime).
    ``M_INT8_THRESHOLD`` is kept as a tuning knob; below it, M == 1
    takes the VPU matvec and other small M the bf16 dequant kernel.
    """

    M_INT8_THRESHOLD = 1

    def __call__(self, x: jax.Array) -> jax.Array:
        from ..kernels.dequant_matmul import vpu_matvec_int8act
        from ..kernels.s4_matmul import s4_matmul
        from ..kernels.w4a8_matmul import w4a8_matmul

        if self.pre_scale is not None:
            x = x / self.pre_scale[...].astype(x.dtype)
        if self.tp_role is not None and self.layout in ("tpu_strided",
                                                        "u4_kpack"):
            from ..kernels.tp_matmul import (tp_w4a8_matmul_column,
                                             tp_w4a8_matmul_row,
                                             tp_woq_matmul_column,
                                             tp_woq_matmul_row)

            kind, axis, data_axis = self.tp_role
            if self.zeros is not None:
                # asym weights keep their zero points on the dequant
                # kernels (the integer-MXU TP kernels are symmetric-only)
                fn = (tp_woq_matmul_column if kind == "column"
                      else tp_woq_matmul_row)
            else:
                fn = (tp_w4a8_matmul_column if kind == "column"
                      else tp_w4a8_matmul_row)
            y = fn(x, self.packed_weight(), self.tp_mesh, axis=axis,
                   data_axis=data_axis)
            if self.bias is not None:
                y = y + self.bias[...].astype(y.dtype)
            return y
        M = 1
        for d in x.shape[:-1]:
            M *= d
        pw = self.packed_weight()
        if pw.layout == "u4_kpack_sc":
            # fused-decode form (scales ride in the packed buffer,
            # quantization.fuse.s4_prepare); non-fused consumers slice
            # the scale rows back off. NOTE: this slice is a per-call
            # copy inside jitted loops — acceptable only because the
            # SC_IN_WEIGHTS lever is experimental/default-off and
            # s4_prepare applies it to decode-dominant programs; flip
            # the lever on for prefill-heavy work and this is the cost
            from ..ops.packing import u4k_strip_scales

            pw = u4k_strip_scales(pw)
        if pw.layout == "u4_kpack":
            # in-kernel bitcast unpack + in-kernel act quant at M == 1
            from ..kernels.fused_matvec import u4k_matmul

            y = u4k_matmul(x, pw)
        elif pw.layout == "s4_rowpack":
            # native-int4 serving layout (Mosaic hardware unpack)
            y = s4_matmul(x, pw)
        elif M >= self.M_INT8_THRESHOLD:
            y = w4a8_matmul(x, pw)
        elif M == 1:
            # all-integer VPU matvec (int8 act x int4 codes)
            y = vpu_matvec_int8act(x, pw)
            if y is None:
                y = woq_matmul(x, pw, impl=self.impl)
        else:
            y = woq_matmul(x, pw, impl=self.impl)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y


class QDQLinear(nnx.Module):
    """Fake-quantized Linear: kernel stored dequantized (bf16), matching the
    numeric result of quantization exactly but at full memory cost. The
    emulation path for accuracy evals (reference QDQ-mode analog,
    fp8_quant QDQ / jax layers_static call_int8)."""

    def __init__(self, kernel_qdq: jax.Array, bias: jax.Array | None = None,
                 meta: dict | None = None):
        self.in_features, self.out_features = kernel_qdq.shape
        self.kernel = nnx.Param(kernel_qdq.astype(jnp.bfloat16))
        self.bias = nnx.Param(bias) if bias is not None else None
        self.meta = meta or {}

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.dot(x.astype(jnp.bfloat16), self.kernel[...],
                    preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y.astype(x.dtype)
