"""W4A8 matmul on native-int4 ("s4_rowpack") weights.

Same contract and numerics as ``w4a8_matmul`` (int8 per-token activations ×
grouped sym-int4 weights, int8-MXU dots, f32 per-group scale accumulation)
but the weights live as an XLA-native int4 buffer viewed zero-copy from the
uint32 "s4_rowpack" storage (ops/packing.py:pack_codes_s4). Mosaic's
hardware int4->int8 convert replaces the shift-plane unpack, which was the
measured wall of the decode step: per-shape GB/s on v5e at M=1

    shape                shift-plane   s4 (this kernel)
    qkv   4096x12288      396           519
    gateup 4096x22016     462           724
    down  11008x4096      360           468

(experiments/mosaic_int4_probe.log; the XLA int4 dot itself reaches only
315-373 — the pallas tiling is still needed, only the unpack changes.)

Parity target: reference ``HPUMixedPrecisionLinear``
(torch/algorithms/mixed_low_precision/modules.py:31) — same role as
kernels/w4a8_matmul.py, which remains the fallback for layouts/backends
this kernel does not cover.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.packing import (PackedWeight, dequantize_packed,
                           resolve_double_quant, s4_view)
from ..ops.qtensor import quantize_act_per_token


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _make_kernel(G, ngk, nk):
    def kernel(xq_ref, w_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc = acc_ref[:]
        for g in range(ngk):
            wg = w_ref[g * G:(g + 1) * G, :].astype(jnp.int8)
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32) * sc_ref[0, g]
        acc_ref[:] = acc

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("G", "K", "N", "tm", "tn", "tk"),
)
def _s4_impl(xq, w4, scales, *, G, K, N, tm, tn, tk):
    M = xq.shape[0]
    nm, nn, nk = M // tm, N // tn, K // tk
    ngk = tk // G
    scales = scales.reshape(nk, ngk, N)
    return pl.pallas_call(
        _make_kernel(G, ngk, nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ngk, tn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=xq.size + K * N // 2 + scales.size * 4
            + M * N * 4,
            transcendentals=0),
    )(xq, w4, scales)


def s4_usable(pw: PackedWeight) -> bool:
    """The kernel runs only on PREPARED weights: ``packed`` must already be
    the int4 [K, N] view (``s4_prepare``/``prepare_serving`` ran inside the
    current program). An unprepared uint32 buffer is NOT viewed per call —
    XLA re-materializes the view inside the decode loop at ~20 GB/s
    (experiments/s4_integration_ab.log); unprepared weights take the XLA
    dequant fallback instead."""
    K, N = pw.orig_shape
    G = pw.group_size if pw.group_size > 0 else K
    return (pw.layout == "s4_rowpack" and pw.bits == 4
            and pw.packed.dtype == jnp.int4
            and pw.zeros is None and pw.dtype == "int"
            and K % G == 0 and N % 256 == 0 and _on_tpu())


def s4_matmul(x: jax.Array, pw: PackedWeight, out_dtype=None) -> jax.Array:
    """y = x @ dequant(Wq) with int8 per-token act quantization; native-int4
    weight tiles. Falls back to the XLA dequant path off-TPU or for shapes
    the kernel does not tile."""
    out_dtype = out_dtype or x.dtype
    pw = resolve_double_quant(pw)
    K, N = pw.orig_shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    if pw.perm is not None:
        x2 = jnp.take(x2, pw.perm, axis=1)
        pw = pw._replace(perm=None)
    M = x2.shape[0]

    G = pw.group_size if pw.group_size > 0 else K
    # tm/tk policy shared with w4a8_matmul (same grid structure, only the
    # unpack is cheaper here)
    from .w4a8_matmul import select_w4a8_tiles

    tm, tk = select_w4a8_tiles(M, K, G)
    # eligibility (s4_usable / fuse._maybe_s4) only guarantees N % 256 ==
    # 0; only widen the decode N-tile when N actually allows it (the
    # quantized llama lm_head has N=32000 ≡ 256 mod 512 — with an
    # unconditional tn=512 it would silently take the bf16-dequant
    # fallback every decode step)
    tn = 512 if (M <= 32 and N % 512 == 0) else 256
    if not s4_usable(pw) or K % tk or N % tn:
        w = dequantize_packed(pw, out_dtype=jnp.bfloat16)
        return jnp.dot(x2.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32
                       ).astype(out_dtype)[:M].reshape(*lead, N)

    xq, x_scale = quantize_act_per_token(x2, bits=8)
    Mp = _round_up(M, tm)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    y = _s4_impl(xq, pw.packed, pw.scales.astype(jnp.float32),
                 G=G, K=K, N=N, tm=tm, tn=tn, tk=tk)
    y = y[:M] * x_scale
    return y.astype(out_dtype).reshape(*lead, N)
