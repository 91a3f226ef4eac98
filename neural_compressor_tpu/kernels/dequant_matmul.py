"""Fused group-dequant-inside-matmul Pallas kernel.

Computes ``y = x @ dequant(Wq)`` without materializing the bf16 weight in
HBM: packed uint32 int4/int2 (or int8) codes are unpacked, zero-shifted and
scaled **in VMEM inside the K-loop**, then fed to the MXU. At decode batch
sizes the matmul is weight-bandwidth-bound, so reading 4 bits/weight instead
of 16 is the ~4x lever.

This is the TPU-native replacement for the reference's fused HPU dequant
matmul (``torch.ops.hpu.convert_from_uint4``,
neural_compressor/torch/algorithms/weight_only/modules.py:742-754). The
packed layout is ``tpu_strided`` (see ops/packing.py): within each group of
G rows, lane-row i field s holds original row ``s*(G/P) + i``, so unpacking
is P shift-planes plus a reshape — no element shuffles on the VPU.

Two implementations, selected by ``impl``:
  * ``"pallas"`` — the fused kernel (TPU; interpret-mode on CPU for tests)
  * ``"xla"``    — dequantize-then-dot, always correct, good for prefill
``"auto"`` picks pallas for small M (decode) and xla for large M (prefill,
where XLA's own fusion + MXU pipelining on the bf16 dot wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.packing import (PackedWeight, dequantize_packed,
                           resolve_double_quant)
from ..ops.qtensor import CODEBOOKS, FLOAT_CODE_DTYPES

_DEFAULT_IMPL = "auto"
# M at or below this → weights-bound decode regime → fused kernel.
_DECODE_M_THRESHOLD = 256


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "pallas", "xla", "vpu")
    _DEFAULT_IMPL = impl


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _codebook_select(codes_f: jax.Array, codebook) -> jax.Array:
    """Map integer codes to codebook values with a select chain (VPU-friendly;
    no gather on TPU)."""
    out = jnp.zeros_like(codes_f)
    for i, v in enumerate(codebook):
        out = jnp.where(codes_f == i, v, out)
    return out


def _unpack_tile(pk, bits: int, n_groups: int, rows_per_group_packed: int):
    """uint32 [TKp, TN] -> int32 codes [TK, TN] in original row order.

    TKp = n_groups * rows_per_group_packed; TK = TKp * P.
    """
    P = 32 // bits
    TN = pk.shape[-1]
    c = pk.reshape(n_groups, rows_per_group_packed, TN)
    mask = (1 << bits) - 1
    planes = [
        ((c >> (bits * s)) & mask).astype(jnp.int32) for s in range(P)
    ]
    codes = jnp.stack(planes, axis=1)  # [ng, P, G/P, TN]
    return codes.reshape(n_groups, P * rows_per_group_packed, TN)


def _dequant_group_codes(codes, scales, zeros, bits, dtype_name, cb_vals):
    """codes [ng, G, TN] int32 (+scales/zeros [ng, TN]) -> bf16 [ng*G, TN].

    Sign handling: int fields are stored OFFSET-BINARY (u = signed + h,
    h = 2^(bits−1), ops/packing.py), so the h constant and the zero point
    merge into ONE broadcast subtract — no per-element sign fix at all.
    """
    if dtype_name in FLOAT_CODE_DTYPES:
        vals = _codebook_select(codes.astype(jnp.float32), cb_vals)
    else:
        half = 1 << (bits - 1)
        zoff = (float(half) + (zeros[:, None, :] if zeros is not None
                               else 0.0))
        vals = codes.astype(jnp.float32) - zoff
    w = vals * scales[:, None, :]
    ng, G, TN = w.shape
    return w.reshape(ng * G, TN)


def _make_kernel(bits, group_size, dtype_name, has_zeros, nk, ngk):
    """Build the kernel body for given static config.

    ``ngk`` = groups per K-tile. Scales/zeros arrive pre-reshaped to
    [nk, ngk, N] and blocked (1, ngk, tn) — the size-1 leading dim selects
    the k-tile, keeping the (sublane, lane) tile equal to the full array
    dims, which is always legal regardless of the group count.
    """
    P = 32 // bits
    rpg = group_size // P  # packed rows per group
    cb = None
    if dtype_name in FLOAT_CODE_DTYPES:
        import numpy as np
        cb = np.asarray(CODEBOOKS.host(dtype_name)).tolist()

    if has_zeros:
        def kernel(x_ref, pk_ref, sc_ref, zr_ref, o_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            sc = sc_ref[0]
            zr = zr_ref[0]
            codes = _unpack_tile(pk_ref[:], bits, ngk, rpg)
            w = _dequant_group_codes(codes, sc, zr, bits,
                                     dtype_name, cb).astype(x_ref.dtype)
            acc_ref[:] += jnp.dot(x_ref[:], w,
                                  preferred_element_type=jnp.float32)

            @pl.when(k == nk - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)
    else:
        def kernel(x_ref, pk_ref, sc_ref, o_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            sc = sc_ref[0]
            codes = _unpack_tile(pk_ref[:], bits, ngk, rpg)
            w = _dequant_group_codes(codes, sc, None, bits,
                                     dtype_name, cb).astype(x_ref.dtype)
            acc_ref[:] += jnp.dot(x_ref[:], w,
                                  preferred_element_type=jnp.float32)

            @pl.when(k == nk - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def _make_kernel_int8(has_zeros, group_size, nk, ngk):
    """int8-codes variant (layout "int8": codes stored unpacked, [K, N])."""
    if has_zeros:
        def kernel(x_ref, cq_ref, sc_ref, zr_ref, o_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            TN = sc_ref.shape[-1]
            sc = sc_ref[0]
            zr = zr_ref[0]
            vals = cq_ref[:].astype(jnp.float32).reshape(ngk, group_size, TN)
            vals = (vals - zr[:, None, :]) * sc[:, None, :]
            w = vals.reshape(ngk * group_size, TN).astype(x_ref.dtype)
            acc_ref[:] += jnp.dot(x_ref[:], w,
                                  preferred_element_type=jnp.float32)

            @pl.when(k == nk - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)
    else:
        def kernel(x_ref, cq_ref, sc_ref, o_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            TN = sc_ref.shape[-1]
            sc = sc_ref[0]
            vals = cq_ref[:].astype(jnp.float32).reshape(ngk, group_size, TN)
            vals = vals * sc[:, None, :]
            w = vals.reshape(ngk * group_size, TN).astype(x_ref.dtype)
            acc_ref[:] += jnp.dot(x_ref[:], w,
                                  preferred_element_type=jnp.float32)

            @pl.when(k == nk - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# VPU matvec (M == 1). The dequant-into-MXU kernel is MXU-element-rate bound
# at M=1 (~3.6e11 el/s measured); a matvec is only 2·K·N flops, well within
# VPU reach, so this kernel never touches the MXU: codes are unpacked and
# multiply-accumulated on the VPU with scales factored per group:
#   y_n = Σ_g s_gn·(A_gn − (8+z_gn)·b_g),  A_gn = Σ_{k∈g} x_k·(u_kn ^ 8)
# (u = raw nibble; u^8 = signed+8 for two's-complement int4 codes).
# Measured (experiments/matvec_bench*.py, v5e): ~41 µs for a 4096² int4
# layer vs ~46 µs MXU-fused and ~107 µs bf16 XLA dot.
# ---------------------------------------------------------------------------


def _make_vpu_kernel(bits, ngk, rpg, tn, nk, has_zeros):
    P = 32 // bits
    mask = (1 << bits) - 1
    half = float(1 << (bits - 1))

    def kernel(x_ref, pk_ref, sc_ref, *rest):
        if has_zeros:
            zr_ref, o_ref, acc_ref = rest
        else:
            o_ref, acc_ref = rest
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        c = pk_ref[:].reshape(ngk, rpg, tn)
        # fields are offset-binary: plane value = signed + half already
        planes = [
            ((c >> (bits * s)) & mask).astype(jnp.int32).astype(jnp.float32)
            for s in range(P)
        ]
        codes8 = jnp.stack(planes, axis=1).reshape(ngk, P * rpg, tn)
        xb = x_ref[0]                      # [ngk, G, 1] f32
        sc = sc_ref[0]                     # [ngk, tn]
        a = jnp.sum(codes8 * xb, axis=1)   # [ngk, tn]
        b = jnp.sum(xb, axis=1)            # [ngk, 1]
        if has_zeros:
            off = half + zr_ref[0]         # [ngk, tn]
        else:
            off = half
        part = jnp.sum(sc * (a - off * b), axis=0)[None, :]
        acc_ref[0:1, :] += part

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[0:1, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "K", "N", "has_zeros",
                     "out_dtype", "interpret", "tn", "tk"),
)
def _vpu_matvec_impl(x, packed, scales, zeros, *, bits, group_size, K, N,
                     has_zeros, out_dtype, interpret, tn, tk):
    G = group_size
    nk, nn = K // tk, N // tn
    ngk = tk // G
    P = 32 // bits
    rpg = G // P
    scales = scales.reshape(nk, ngk, N)
    if has_zeros:
        zeros = zeros.reshape(nk, ngk, N)
    x4 = x.astype(jnp.float32).reshape(nk, ngk, G, 1)

    in_specs = [
        pl.BlockSpec((1, ngk, G, 1), lambda j, k: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tk // P, tn), lambda j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ngk, tn), lambda j, k: (k, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x4, packed, scales]
    if has_zeros:
        in_specs.append(in_specs[-1])
        args.append(zeros)

    y = pl.pallas_call(
        _make_vpu_kernel(bits, ngk, rpg, tn, nk, has_zeros),
        grid=(nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N,
            bytes_accessed=packed.size * 4 + scales.size * 4 + (K + N) * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return y.astype(out_dtype)


def _vpu_tiles(K, N, G):
    """(tk, tn) for the VPU matvec, or None if the shape doesn't tile."""
    tk = G
    while tk * 2 <= min(K, 1024) and K % (tk * 2) == 0:
        tk *= 2
    tn = 512 if N % 512 == 0 else (256 if N % 256 == 0 else
                                   (128 if N % 128 == 0 else None))
    if tn is None or K % tk or tk % G:
        return None
    return tk, tn


def vpu_matvec(x: jax.Array, pw: PackedWeight, out_dtype=None):
    """y[..., N] = x[..., K] @ dequant(pw) for a SINGLE row of x, VPU-only.

    Returns None when not applicable (M>1, codebook dtypes, unpacked
    layouts, or non-tiling shapes) — callers fall back to the MXU path.
    """
    K, N = pw.orig_shape
    out_dtype = out_dtype or x.dtype
    M = 1
    for d in x.shape[:-1]:
        M *= d
    G = pw.group_size if pw.group_size > 0 else K
    if (M != 1 or pw.layout != "tpu_strided"
            or pw.dtype in FLOAT_CODE_DTYPES or pw.bits not in (2, 4)
            or G % (32 // pw.bits)):
        return None
    tiles = _vpu_tiles(K, N, G)
    if tiles is None:
        return None
    tk, tn = tiles
    pw = resolve_double_quant(pw)
    lead = x.shape[:-1]
    x2 = x.reshape(1, K)
    if pw.perm is not None:
        x2 = jnp.take(x2, pw.perm, axis=1)
    y = _vpu_matvec_impl(
        x2, pw.packed, pw.scales.astype(jnp.float32),
        None if pw.zeros is None else pw.zeros.astype(jnp.float32),
        bits=pw.bits, group_size=G, K=K, N=N,
        has_zeros=pw.zeros is not None, out_dtype=jnp.dtype(out_dtype),
        interpret=not _on_tpu(), tn=tn, tk=tk)
    return y.reshape(*lead, N)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "dtype_name", "layout", "K", "N",
                     "has_zeros", "out_dtype", "interpret", "tm", "tn", "tk"),
)
def _dequant_matmul_impl(x, packed, scales, zeros, *, bits, group_size,
                         dtype_name, layout, K, N, has_zeros, out_dtype,
                         interpret, tm, tn, tk):
    M = x.shape[0]
    G = group_size
    nm, nn, nk = M // tm, N // tn, K // tk

    grid = (nm, nn, nk)
    ngk = tk // G
    # scales/zeros as [nk, ngk, N]; size-1 leading block dim selects k-tile
    scales = scales.reshape(nk, ngk, N)
    if has_zeros:
        zeros = zeros.reshape(nk, ngk, N)
    x_spec = pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                          memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, ngk, tn), lambda i, j, k: (k, 0, j),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                          memory_space=pltpu.VMEM)

    if layout == "tpu_strided":
        P = 32 // bits
        pk_spec = pl.BlockSpec((tk // P, tn), lambda i, j, k: (k, j),
                               memory_space=pltpu.VMEM)
        kernel = _make_kernel(bits, G, dtype_name, has_zeros, nk, ngk)
    else:  # int8 codes, unpacked
        pk_spec = pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                               memory_space=pltpu.VMEM)
        kernel = _make_kernel_int8(has_zeros, G, nk, ngk)

    in_specs = [x_spec, pk_spec, sc_spec]
    args = [x, packed, scales]
    if has_zeros:
        in_specs.append(sc_spec)
        args.append(zeros)

    flops = 2 * M * N * K
    bytes_accessed = (
        x.size * x.dtype.itemsize + packed.size * packed.dtype.itemsize
        + scales.size * 4 + M * N * 2
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(*args)


def _pick_tiles(M, K, N, G, bits, layout):
    """Tile sizes: K-tile must be a multiple of G and of the packing P·rows;
    N-tile a multiple of 128. M-tile: a block whose sublane dim equals the
    full array dim is always legal, so small-M (decode) runs unpadded —
    padding/slicing around every call costs more than the kernel at M=1."""
    if M <= 16:
        tm = M  # full-dim block: no padding, no output slice
    else:
        tm = min(_round_up(M, 16), 256)
    tn = 128 if N % 256 else 256
    # K tile: as many groups as fit a VMEM budget (~4MB for the weight tile)
    tk = G
    while tk * 2 <= min(K, 2048) and K % (tk * 2) == 0:
        tk *= 2
    return tm, tn, tk


def dequant_matmul_pallas(x: jax.Array, pw: PackedWeight,
                          out_dtype=None) -> jax.Array:
    """y[M,N] = x[M,K] @ dequant(pw). Pads M to the tile size as needed."""
    pw = resolve_double_quant(pw)
    K, N = pw.orig_shape
    assert x.shape[-1] == K, f"x K={x.shape[-1]} vs weight K={K}"
    out_dtype = out_dtype or x.dtype
    G = pw.group_size if pw.group_size > 0 else K
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    if pw.perm is not None:
        # packed rows are stored permuted: contract x in the same order
        x2 = jnp.take(x2, pw.perm, axis=1)
        pw = pw._replace(perm=None)
    M = x2.shape[0]

    interpret = not _on_tpu()
    tm, tn, tk = _pick_tiles(M, K, N, G, pw.bits, pw.layout)
    Mp = _round_up(M, tm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    if x2.dtype not in (jnp.bfloat16, jnp.float32):
        x2 = x2.astype(jnp.bfloat16)
    slice_back = Mp != M

    if K % tk or N % tn or tk % G:
        # Shapes that don't tile cleanly: fall back to XLA path.
        y = jnp.dot(x2, dequantize_packed(pw, out_dtype=x2.dtype),
                    preferred_element_type=jnp.float32).astype(out_dtype)
        return y[:M].reshape(*lead, N)

    y = _dequant_matmul_impl(
        x2, pw.packed, pw.scales.astype(jnp.float32),
        None if pw.zeros is None else pw.zeros.astype(jnp.float32),
        bits=pw.bits, group_size=G, dtype_name=pw.dtype, layout=pw.layout,
        K=K, N=N, has_zeros=pw.zeros is not None, out_dtype=out_dtype,
        interpret=interpret, tm=tm, tn=tn, tk=tk,
    )
    if slice_back:
        y = y[:M]
    return y.reshape(*lead, N)


def _make_vpu_int_kernel(bits, ngk, rpg, tn, nk, has_zeros):
    """All-integer inner loop (W4A8 decode): per-token-int8 x times raw
    nibbles, 4-5 VPU ops/element (shift, and, xor, int-mul, int-add); the
    float work (scales, offset correction) is per GROUP, not per element."""
    P = 32 // bits
    mask = (1 << bits) - 1
    half = float(1 << (bits - 1))

    def kernel(x_ref, xs_ref, pk_ref, sc_ref, *rest):
        if has_zeros:
            zr_ref, o_ref, acc_ref = rest
        else:
            o_ref, acc_ref = rest
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        c = pk_ref[:].reshape(ngk, rpg, tn)
        # offset-binary fields: u = signed + half with no per-element fix
        planes = [((c >> (bits * s)) & mask).astype(jnp.int32)
                  for s in range(P)]
        u = jnp.stack(planes, axis=1).reshape(ngk, P * rpg, tn)
        xq = x_ref[0]                       # [ngk, G, 1] int32
        a = jnp.sum(u * xq, axis=1)         # [ngk, tn] int32
        b = jnp.sum(xq, axis=1)             # [ngk, 1] int32
        sc = sc_ref[0]
        off = half + (zr_ref[0] if has_zeros else 0.0)
        af = a.astype(jnp.float32) - off * b.astype(jnp.float32)
        acc_ref[0:1, :] += jnp.sum(sc * af, axis=0)[None, :] * xs_ref[0]

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[0:1, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "K", "N", "has_zeros",
                     "out_dtype", "interpret", "tn", "tk"),
)
def _vpu_matvec_int_impl(x, packed, scales, zeros, *, bits, group_size, K, N,
                         has_zeros, out_dtype, interpret, tn, tk):
    G = group_size
    nk, nn = K // tk, N // tn
    ngk = tk // G
    P = 32 // bits
    rpg = G // P
    scales = scales.reshape(nk, ngk, N)
    if has_zeros:
        zeros = zeros.reshape(nk, ngk, N)
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
    xs = (amax / 127.0).reshape(1)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int32)
    x4 = xq.reshape(nk, ngk, G, 1)

    in_specs = [
        pl.BlockSpec((1, ngk, G, 1), lambda j, k: (k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # xs [1]
        pl.BlockSpec((tk // P, tn), lambda j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ngk, tn), lambda j, k: (k, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x4, xs, packed, scales]
    if has_zeros:
        in_specs.append(in_specs[-1])
        args.append(zeros)

    y = pl.pallas_call(
        _make_vpu_int_kernel(bits, ngk, rpg, tn, nk, has_zeros),
        grid=(nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N,
            bytes_accessed=packed.size * 4 + scales.size * 4 + (K + N) * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return y.astype(out_dtype)


def vpu_matvec_int8act(x: jax.Array, pw: PackedWeight, out_dtype=None):
    """W4A8 single-row decode: x is quantized to per-token int8 and the
    multiply-accumulate runs in int32 on the VPU (cheapest ops/element).
    Same applicability rules as ``vpu_matvec``; returns None when not
    applicable."""
    K, N = pw.orig_shape
    out_dtype = out_dtype or x.dtype
    M = 1
    for d in x.shape[:-1]:
        M *= d
    G = pw.group_size if pw.group_size > 0 else K
    if (M != 1 or pw.layout != "tpu_strided"
            or pw.dtype in FLOAT_CODE_DTYPES or pw.bits not in (2, 4)
            or G % (32 // pw.bits)):
        return None
    tiles = _vpu_tiles(K, N, G)
    if tiles is None:
        return None
    tk, tn = tiles
    pw = resolve_double_quant(pw)
    lead = x.shape[:-1]
    x2 = x.reshape(1, K)
    if pw.perm is not None:
        x2 = jnp.take(x2, pw.perm, axis=1)
    y = _vpu_matvec_int_impl(
        x2, pw.packed, pw.scales.astype(jnp.float32),
        None if pw.zeros is None else pw.zeros.astype(jnp.float32),
        bits=pw.bits, group_size=G, K=K, N=N,
        has_zeros=pw.zeros is not None, out_dtype=jnp.dtype(out_dtype),
        interpret=not _on_tpu(), tn=tn, tk=tk)
    return y.reshape(*lead, N)


def woq_matmul(x: jax.Array, pw: PackedWeight, impl: str | None = None,
               out_dtype=None) -> jax.Array:
    """Quantized-weight matmul dispatcher (see module docstring)."""
    impl = impl or _DEFAULT_IMPL
    out_dtype = out_dtype or x.dtype
    if impl == "auto":
        M = 1
        for d in x.shape[:-1]:
            M *= d
        if M == 1 and _on_tpu():
            impl = "vpu"  # single-row decode: VPU matvec beats the MXU path
        elif M <= _DECODE_M_THRESHOLD and _on_tpu():
            impl = "pallas"
        else:
            impl = "xla"
    if impl == "vpu":
        y = vpu_matvec(x, pw, out_dtype=out_dtype)
        if y is not None:
            return y
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas":
        return dequant_matmul_pallas(x, pw, out_dtype=out_dtype)
    # Serving runs bf16; keep f32 activations in f32 for accuracy evals.
    cdt = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    if pw.perm is not None:
        x = jnp.take(x, pw.perm, axis=-1)
        pw = pw._replace(perm=None)
    w = dequantize_packed(pw, out_dtype=cdt)
    return jnp.dot(x.astype(cdt), w,
                   preferred_element_type=jnp.float32).astype(out_dtype)
