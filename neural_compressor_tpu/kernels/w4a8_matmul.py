"""W4A8 fused kernel: int8 activations × packed int4 weights on the MXU's
int8 path.

Parity target: the reference's hybrid GPTQ W4A8 serving
(neural_compressor/torch/algorithms/mixed_low_precision/modules.py:31 —
``HPUMixedPrecisionLinear``, int4 weights dequantized into the fp8 matmul).
TPU redesign: v5e's MXU runs int8×int8→int32 at twice the bf16 rate, so the
kernel keeps the **integer** codes and accumulates per-group:

    y[m, n] = x_scale[m] · Σ_g w_scale[g, n] · Σ_{k∈g} xq[m, k] · wq[k, n]

The inner dot is an int8 MXU matmul per group (unrolled over the groups of
the K-tile); scales apply on the int32 partials in f32. Symmetric weights
only (the standard W4A8 configuration). At small M the weights-bound fused
bf16 kernel is faster — ``W4A8Linear`` dispatches by batch regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.packing import (PackedWeight, dequantize_packed,
                           resolve_double_quant)
from ..ops.qtensor import quantize_act_per_token


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _make_kernel(bits, G, ngk, nk):
    P = 32 // bits
    rpg = G // P

    def kernel(xq_ref, pk_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        TN = pk_ref.shape[-1]
        pk = pk_ref[:].reshape(ngk, rpg, TN)
        mask = (1 << bits) - 1
        half = 1 << (bits - 1)
        acc = acc_ref[:]
        for g in range(ngk):
            planes = [((pk[g] >> (bits * s)) & mask).astype(jnp.int32)
                      for s in range(P)]
            codes = jnp.stack(planes, axis=0).reshape(G, TN)
            codes = (codes - half).astype(jnp.int8)  # offset-binary fields
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(
                xg, codes, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32) * sc_ref[0, g]
        acc_ref[:] = acc

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bits", "G", "K", "N", "interpret", "tm", "tn", "tk"),
)
def _w4a8_impl(xq, packed, scales, *, bits, G, K, N, interpret, tm, tn, tk):
    M = xq.shape[0]
    nm, nn, nk = M // tm, N // tn, K // tk
    ngk = tk // G
    scales = scales.reshape(nk, ngk, N)
    kernel = _make_kernel(bits, G, ngk, nk)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // (32 // bits), tn), lambda i, j, k: (k, j),
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
            bytes_accessed=xq.size + packed.size * 4 + scales.size * 4
            + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(xq, packed, scales)


def select_w4a8_tiles(M: int, K: int, G: int) -> tuple[int, int]:
    """(tm, tk) for the grouped int8-MXU kernels (shared by w4a8_matmul
    and s4_matmul — the two kernels have the same grid structure and the
    policy below was measured on both; only tn differs per kernel).

    Tile sweep on v5e (experiments/prefill_sweep*.log): tm=1024/tk=4096
    hits 198 TF/s at M=2048 — 1.46x the bf16 dot and ~87% of the raw int8
    MXU rate; tm=2048 exceeds VMEM. The K-tile must be a multiple of G
    dividing K; small tk makes the kernel grid-overhead bound (K=11008
    with tk=256 ran at 89 GB/s, experiments/w4a8_m16.log)."""
    tm = min(_round_up(M, 32), 1024)  # int8 sublane = 32
    if M > 1024:
        # ragged large M: equal-split tiles bound pad waste to <1 sublane
        # per tile (M=1025 with tm=1024 would pad to 2048 — 2x the FLOPs
        # in the compute-bound regime)
        ntiles = -(-M // 1024)
        tm = _round_up(-(-M // ntiles), 32)
    ng = K // G

    def _largest_tk(cap):
        t = G
        for m in range(1, ng + 1):
            if ng % m == 0 and m * G <= cap:
                t = m * G
        return t

    if tm <= 32:
        # decode tiles: grid-step overhead dominates — take the largest
        # K-tile available (K=11008: tk=5504 runs 351 GB/s vs 89 at 256)
        tk = _largest_tk(6144)
    else:
        # batched/prefill tiles: measured optima sit at power-of-2-ish
        # tk (K=4096 prefers 4096, K=14336 prefers 2048 over 3584 —
        # batched_llama3 B=96/128 regressed 13% on the larger tile)
        tk = G
        while tk * 2 <= min(K, 4096) and K % (tk * 2) == 0:
            tk *= 2
        if tk <= 512:
            # pathological K (11008 = 86 groups): no mid-size power-of-2
            # tile exists; shrink the M-tile to afford the big one
            tm, tk = min(tm, 512), _largest_tk(6144)
    return tm, tk


def w4a8_matmul(x: jax.Array, pw: PackedWeight, out_dtype=None) -> jax.Array:
    """y = x @ dequant(Wq) with int8 per-token act quantization and the
    integer MXU path. Requires sym int4 tpu_strided weights; falls back to
    the bf16 dequant path otherwise."""
    out_dtype = out_dtype or x.dtype
    pw = resolve_double_quant(pw)
    K, N = pw.orig_shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    if pw.perm is not None:
        # rows stored permuted (act-order/GAR): contract x in stored order
        x2 = jnp.take(x2, pw.perm, axis=1)
        pw = pw._replace(perm=None)
    M = x2.shape[0]

    usable = (pw.layout == "tpu_strided" and pw.bits == 4
              and pw.zeros is None and pw.dtype == "int")
    G = pw.group_size if pw.group_size > 0 else K
    tm, tk = select_w4a8_tiles(M, K, G)
    tn = 256
    if not usable or K % tk or N % tn:
        w = dequantize_packed(pw, out_dtype=jnp.bfloat16)
        return jnp.dot(x2.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32
                       ).astype(out_dtype)[:M].reshape(*lead, N)

    xq, x_scale = quantize_act_per_token(x2, bits=8)
    Mp = _round_up(M, tm)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    y = _w4a8_impl(xq, pw.packed, pw.scales.astype(jnp.float32),
                   bits=pw.bits, G=G, K=K, N=N, interpret=not _on_tpu(),
                   tm=tm, tn=tn, tk=tk)
    y = y[:M] * x_scale
    return y.astype(out_dtype).reshape(*lead, N)
