"""Bit packing for quantized weights, laid out for TPU kernels.

Canonical packed format ("tpu_strided"): int4/int2 codes of shape [K, N]
(K = reduction dim) are packed into uint32 lanes **along K**, strided within
each quantization group so a Pallas kernel can unpack nibble-planes with
cheap shifts and a plain reshape — no element interleave / relayout:

    for group g (G rows), lane-row i in [0, G/P), nibble/field s in [0, P):
        packed[g*G/P + i, n] field s  ==  codes[g*G + s*(G/P) + i, n]

where P = 32/bits values per uint32 lane. Unpacking all P shift-planes and
concatenating along the row axis reproduces the original order.

This replaces the reference's numba bit packers
(neural_compressor/torch/utils/bit_packer.py:25-278) and the
optimum/GPTQ-format packing in
neural_compressor/torch/algorithms/weight_only/modules.py:195-268, with a
layout chosen for MXU-friendly unpack instead of CPU loops. Interchange
converters to/from the GPTQ ("optimum") layout are provided for checkpoint
compatibility.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .qtensor import QTensor, CODEBOOKS, FLOAT_CODE_DTYPES

LANE_BITS = 32


class PackedWeight(NamedTuple):
    """A packed, serving-ready quantized weight.

    ``packed``: uint32 [K/P, N] (bits in {2,4}) or int8 [K, N] (bits==8 or
        unpacked fallback).
    ``scales``: [K/G, N] float32.
    ``zeros``: optional [K/G, N] (asym int zero points), float32.
    ``bits`` / ``group_size`` / ``dtype`` / ``orig_shape``: as in QTensor.
    ``layout``: "tpu_strided" | "int8" | "raw".
    ``perm``: optional int32 [K] input-row permutation. When set, the packed
        rows are stored in PERMUTED order (groups contiguous): stored row i
        corresponds to original input row ``perm[i]``. The matmul applies
        ``x[..., perm]`` before contracting; dequantization scatters rows
        back. Produced by act-order (g_idx) GPTQ checkpoint import and by
        GAR/hybrid_order GPTQ.
    """

    packed: jax.Array
    scales: jax.Array
    zeros: jax.Array | None
    bits: int
    group_size: int
    dtype: str
    orig_shape: tuple[int, int]
    layout: str
    perm: jax.Array | None = None
    # double quantization (reference weight_only/utility.py:273-436): when
    # active, ``scales`` holds int8 CODES and these carry their scale/zero
    # per [G2 x N] super-group — a real 4x memory cut on the scale tensors
    sq_scales: jax.Array | None = None  # f32 [ng2, N]
    sq_zeros: jax.Array | None = None   # f32 [ng2, N] (asym) | None


def _values_per_lane(bits: int) -> int:
    return LANE_BITS // bits


import functools


@functools.partial(jax.jit,
                   static_argnames=("bits", "group_size", "offset_binary"))
def pack_codes(codes: jax.Array, bits: int, group_size: int,
               offset_binary: bool = True) -> jax.Array:
    """Pack int codes [K, N] -> uint32 [K/P, N] in tpu_strided layout.

    ``offset_binary`` (int dtypes): each field stores ``signed + 2^(b-1)``
    so kernels unpack with shift+mask alone — no per-element sign fix (for
    4-bit two's complement this is just an XOR with 8 at pack time).
    Codebook dtypes (nf4/fp4) store their raw unsigned indices
    (offset_binary=False). Requires K % G == 0 and G % P == 0.
    """
    P = _values_per_lane(bits)
    K, N = codes.shape
    G = group_size if group_size > 0 else K
    assert K % G == 0, f"K={K} not a multiple of group_size={G}"
    assert G % P == 0, f"group_size={G} not a multiple of values-per-lane={P}"
    ng = K // G
    mask = (1 << bits) - 1
    c = codes.astype(jnp.uint32) & mask
    if offset_binary:
        c = c ^ (1 << (bits - 1))
    # [ng, P, G/P, N]: field s holds original row s*(G/P)+i of group g
    c = c.reshape(ng, P, G // P, N)
    packed = jnp.zeros((ng, G // P, N), dtype=jnp.uint32)
    for s in range(P):
        packed = packed | (c[:, s] << (bits * s))
    return packed.reshape(ng * (G // P), N)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "K", "signed"))
def unpack_codes(packed: jax.Array, bits: int, group_size: int, K: int,
                 signed: bool) -> jax.Array:
    """Inverse of ``pack_codes``: uint32 [K/P, N] -> int8 codes [K, N].

    ``signed=True`` fields are offset-binary (see pack_codes)."""
    P = _values_per_lane(bits)
    G = group_size if group_size > 0 else K
    ng = K // G
    N = packed.shape[-1]
    p = packed.reshape(ng, G // P, N)
    mask = (1 << bits) - 1
    planes = [(p >> (bits * s)) & mask for s in range(P)]
    codes = jnp.concatenate(planes, axis=1).reshape(K, N).astype(jnp.int32)
    if signed:
        codes = codes - (1 << (bits - 1))
    return codes.astype(jnp.int8)


@jax.jit
def pack_codes_s4(codes: jax.Array) -> jax.Array:
    """Pack SIGNED int4 codes [K, N] -> uint32 [K, N/8] in "s4_rowpack"
    layout: word (k, j) holds the 8 CONSECUTIVE output columns
    8j..8j+7 of input row k, nibble s = column 8j+s, two's complement.

    This is exactly XLA's native S4 element order for a row-major [K, N]
    int4 array, so ``s4_view`` (bitcast + reshape) reinterprets the buffer
    with NO copy inside a jitted program — the serving kernel then uses
    Mosaic's hardware int4->int8 convert, measured 1.3-1.6x faster than
    shift-plane unpacking (experiments/mosaic_int4_probe.log).
    """
    K, N = codes.shape
    c = codes.astype(jnp.uint32) & 0xF
    c = c.reshape(K, N // 8, 8)
    packed = jnp.zeros((K, N // 8), dtype=jnp.uint32)
    for s in range(8):
        packed = packed | (c[..., s] << (4 * s))
    return packed


def s4_view(packed: jax.Array, K: int, N: int) -> jax.Array:
    """Zero-copy int4 [K, N] view of an "s4_rowpack" uint32 buffer.

    Must run inside jit — standalone int4 arrays cannot cross a dispatch
    boundary under the remote-TPU plugin (device_put recursion), which is
    why the storage dtype stays uint32."""
    return jax.lax.bitcast_convert_type(packed, jnp.int4).reshape(K, N)


@functools.partial(jax.jit, static_argnames=("K", "N"))
def unpack_codes_s4(packed: jax.Array, K: int, N: int) -> jax.Array:
    """Inverse of ``pack_codes_s4`` without int4 dtypes (CPU-safe):
    uint32 [K, N/8] -> signed int8 codes [K, N]."""
    planes = [((packed >> (4 * s)) & 0xF).astype(jnp.int32)
              for s in range(8)]
    c = jnp.stack(planes, axis=-1).reshape(K, N)
    return jnp.where(c >= 8, c - 16, c).astype(jnp.int8)


def to_s4_rowpack(pw: PackedWeight) -> PackedWeight:
    """Convert a sym-int4 PackedWeight to the "s4_rowpack" serving layout
    (see ``pack_codes_s4``). Requires sym int ("zeros is None"), bits=4,
    N % 8 == 0. Double-quantized scale meta survives unchanged (only the
    code layout is repacked; kernels resolve scales at entry)."""
    K, N = pw.orig_shape
    if not (pw.bits == 4 and pw.dtype == "int" and pw.zeros is None
            and N % 8 == 0 and pw.layout == "tpu_strided"):
        raise ValueError(f"not s4_rowpack-convertible: bits={pw.bits} "
                         f"dtype={pw.dtype} layout={pw.layout} N={N}")
    codes = unpack_to_codes(pw)
    return pw._replace(packed=pack_codes_s4(codes), layout="s4_rowpack")


@jax.jit
def pack_codes_u4k(codes: jax.Array) -> jax.Array:
    """Pack SIGNED int4 codes [K, N] -> uint32 [K/8, N] in "u4_kpack"
    layout: word (r, n) holds the 8 CONSECUTIVE input rows 8r..8r+7 of
    output column n, nibble j = row 8r+j, two's complement.

    This matches Mosaic's packed int4 register layout ((8, 1) sublane
    subtiling: 8 consecutive sublanes share one 32-bit container), so an
    IN-KERNEL ``pltpu.bitcast(w_ref[...], int4)`` reinterprets the loaded
    u32 tile as int4 [8r, n] with no XLA-level int4 array at all — no
    zero-copy view to hoist, no layout copy for XLA to rematerialize
    inside the decode loop (round-3 profile: the s4_view materialization
    cost ~0.7 ms/step in the full model), and the buffer shards under TP
    shard_map like any u32 array (experiments/bitcast_matvec.log:
    nibble-order probe MATCH for low-first, 460-590 GB/s)."""
    K, N = codes.shape
    c = codes.astype(jnp.uint32) & 0xF
    c = c.reshape(K // 8, 8, N)
    packed = jnp.zeros((K // 8, N), dtype=jnp.uint32)
    for j in range(8):
        packed = packed | (c[:, j, :] << (4 * j))
    return packed


@functools.partial(jax.jit, static_argnames=("K", "N"))
def unpack_codes_u4k(packed: jax.Array, K: int, N: int) -> jax.Array:
    """Inverse of ``pack_codes_u4k`` without int4 dtypes (CPU-safe):
    uint32 [K/8, N] -> signed int8 codes [K, N]."""
    planes = [((packed >> (4 * j)) & 0xF).astype(jnp.int32)
              for j in range(8)]
    c = jnp.stack(planes, axis=1).reshape(K, N)
    return jnp.where(c >= 8, c - 16, c).astype(jnp.int8)


def to_u4_kpack(pw: PackedWeight) -> PackedWeight:
    """Convert a sym-int4 PackedWeight to the "u4_kpack" serving layout
    (see ``pack_codes_u4k``). Requires sym int, bits=4, K % 8 == 0.
    Double-quantized scale meta survives unchanged."""
    K, N = pw.orig_shape
    if not (pw.bits == 4 and pw.dtype == "int" and pw.zeros is None
            and K % 8 == 0 and pw.layout in ("tpu_strided", "s4_rowpack")):
        raise ValueError(f"not u4_kpack-convertible: bits={pw.bits} "
                         f"dtype={pw.dtype} layout={pw.layout} K={K}")
    codes = unpack_to_codes(pw)
    return pw._replace(packed=pack_codes_u4k(codes), layout="u4_kpack")


def u4k_append_scales(pw: PackedWeight) -> PackedWeight:
    """u4_kpack -> "u4_kpack_sc": the f32 group scales ride as extra u32
    rows at the bottom of the packed buffer (bitcast, no conversion), so
    the fused decode matvec takes ONE weight operand instead of two.

    Why: the round-3 llama3 trace shows XLA's memory-space assignment
    pre-staging the separate f32 scale operands into VMEM at 768 us/step
    of serialized copy-waits; a single combined operand leaves nothing to
    stage. The appended rows are zero-padded to a sublane multiple (8) so
    the kernel's row slicing stays aligned; the kernel reads only the
    first K/G scale rows."""
    K, N = pw.orig_shape
    G = pw.group_size if pw.group_size > 0 else K
    if (pw.layout != "u4_kpack" or pw.sq_scales is not None
            or pw.scales.shape != (K // G, N)):
        raise ValueError(
            f"not u4_kpack_sc-convertible: layout={pw.layout} "
            f"K/G={K // G} scales={getattr(pw.scales, 'shape', None)}")
    sc_rows = jax.lax.bitcast_convert_type(
        pw.scales.astype(jnp.float32), jnp.uint32)
    pad = (-(K // G)) % 8
    if pad:
        sc_rows = jnp.pad(sc_rows, ((0, pad), (0, 0)))
    return pw._replace(packed=jnp.concatenate([pw.packed, sc_rows], axis=0),
                       layout="u4_kpack_sc")


def u4k_strip_scales(pw: PackedWeight) -> PackedWeight:
    """Undo ``u4k_append_scales`` (for consumers of the plain u4_kpack
    layout — an XLA row slice, contiguous, cheap outside loops)."""
    if pw.layout != "u4_kpack_sc":
        return pw
    K, _N = pw.orig_shape
    return pw._replace(packed=pw.packed[: K // 8], layout="u4_kpack")


def pack_qtensor(qt: QTensor, force_int8: bool = False,
                 perm: jax.Array | None = None) -> PackedWeight:
    """QTensor -> PackedWeight in the best available layout.

    ``perm``: optional [K] row permutation — the QTensor's codes/scales are
    already in permuted (group-contiguous) order; record it for the matmul.
    """
    K, N = qt.orig_shape
    G = qt.group_size
    P = _values_per_lane(qt.bits) if qt.bits in (2, 4) else 0
    packable = (
        not force_int8
        and qt.bits in (2, 4)
        and K % G == 0
        and G % P == 0
    )
    if packable:
        packed = pack_codes(qt.codes[:K], qt.bits, G,
                            offset_binary=qt.dtype not in FLOAT_CODE_DTYPES)
        layout = "tpu_strided"
    else:
        packed = qt.codes[:K].astype(jnp.int8)
        layout = "int8"
    return PackedWeight(
        packed=packed,
        scales=qt.scales.astype(jnp.float32),
        zeros=None if qt.zeros is None else qt.zeros.astype(jnp.float32),
        bits=qt.bits,
        group_size=G,
        dtype=qt.dtype,
        orig_shape=(K, N),
        layout=layout,
        perm=None if perm is None else jnp.asarray(perm, dtype=jnp.int32),
    )


def effective_scales(pw: PackedWeight) -> jax.Array:
    """f32 group scales, dequantizing double-quantized (int8-coded) ones."""
    if pw.sq_scales is None:
        return pw.scales.astype(jnp.float32)
    ng, N = pw.scales.shape
    ng2 = pw.sq_scales.shape[0]
    G2 = ng // ng2
    c = pw.scales.astype(jnp.float32).reshape(ng2, G2, N)
    if pw.sq_zeros is not None:
        c = c - pw.sq_zeros[:, None, :]
    return (c * pw.sq_scales[:, None, :]).reshape(ng, N)


def resolve_double_quant(pw: PackedWeight) -> PackedWeight:
    """Materialize f32 scales from a double-quantized PackedWeight (no-op
    otherwise) — kernels call this at entry; the compact form only exists
    in storage (Params / checkpoints)."""
    if pw.sq_scales is None:
        return pw
    return pw._replace(scales=effective_scales(pw), sq_scales=None,
                       sq_zeros=None)


def apply_double_quant(pw: PackedWeight, bits: int = 8, group_size: int = 256,
                       sym: bool = False) -> PackedWeight:
    """Quantize the scale tensor itself (reference double-quant,
    weight_only/utility.py:273-436): scales [ng, N] are grouped along the
    group axis in super-groups of ``group_size`` and stored as int8 codes
    plus per-super-group f32 scale/zero. Memory: 4 bytes -> 1 byte per
    group scale."""
    assert 2 <= bits <= 8, "double-quant codes are stored int8"
    half = float(1 << (bits - 1))
    scales = pw.scales.astype(jnp.float32)
    ng, N = scales.shape
    G2 = min(group_size, ng)
    while ng % G2:
        G2 -= 1  # largest divisor <= requested super-group
    ng2 = ng // G2
    s = scales.reshape(ng2, G2, N)
    if sym:
        qmax = half - 1
        s2 = jnp.max(jnp.abs(s), axis=1) / qmax
        s2 = jnp.where(s2 <= 0, 1.0, s2)
        codes = jnp.clip(jnp.round(s / s2[:, None, :]), -half, qmax)
        z2 = None
    else:
        mx = jnp.max(s, axis=1)
        mn = jnp.min(s, axis=1)
        s2 = (mx - mn) / (2.0 * half - 1.0)
        s2 = jnp.where(s2 <= 0, 1.0, s2)
        z2 = jnp.round(-mn / s2) - half  # centered zero point
        codes = jnp.clip(jnp.round(s / s2[:, None, :]) + (z2[:, None, :] + half),
                         0, 2.0 * half - 1.0) - half
    return pw._replace(scales=codes.reshape(ng, N).astype(jnp.int8),
                       sq_scales=s2, sq_zeros=z2)


def unpack_to_codes(pw: PackedWeight) -> jax.Array:
    """PackedWeight -> int8 codes [K, N]."""
    if pw.layout == "u4_kpack_sc":
        pw = u4k_strip_scales(pw)
    K, N = pw.orig_shape
    if pw.layout == "tpu_strided":
        # int codes (sym and centered-asym alike) are two's-complement signed;
        # codebook indices are unsigned.
        signed = pw.dtype not in FLOAT_CODE_DTYPES
        return unpack_codes(pw.packed, pw.bits, pw.group_size, K, signed=signed)
    if pw.layout == "s4_rowpack":
        if pw.packed.dtype == jnp.uint32:
            return unpack_codes_s4(pw.packed, K, N)
        return pw.packed.astype(jnp.int8)  # prepared int4 view
    if pw.layout == "u4_kpack":
        return unpack_codes_u4k(pw.packed, K, N)
    return pw.packed.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "dtype", "layout", "K", "out_dtype"),
)
def _dequantize_packed_arrays(packed, scales, zeros, bits, group_size, dtype,
                              layout, K, out_dtype):
    G = group_size
    if layout == "tpu_strided":
        signed = dtype not in FLOAT_CODE_DTYPES
        codes = unpack_codes(packed, bits, G, K, signed=signed)
    elif layout == "s4_rowpack":
        if packed.dtype == jnp.uint32:
            codes = unpack_codes_s4(packed, K, packed.shape[-1] * 8)
        else:
            codes = packed.astype(jnp.int8)  # prepared int4 view
    elif layout == "u4_kpack":
        codes = unpack_codes_u4k(packed, packed.shape[0] * 8,
                                 packed.shape[-1])
    else:
        codes = packed.astype(jnp.int8)
    N = codes.shape[-1]
    rem = codes.shape[0] % G
    if rem:
        # "int8" layout stores K unpadded rows; scales cover ceil(K/G)
        # groups (quantization pads) — re-pad before grouping
        codes = jnp.pad(codes, ((0, G - rem), (0, 0)))
    codes = codes.reshape(-1, G, N)
    if dtype in FLOAT_CODE_DTYPES:
        vals = CODEBOOKS[dtype][codes.astype(jnp.int32)]
    else:
        vals = codes.astype(jnp.float32)
        if zeros is not None:
            vals = vals - zeros[:, None, :]
    w = vals * scales[:, None, :]
    return w.reshape(-1, N)[:K].astype(out_dtype)


def dequantize_packed(pw: PackedWeight, out_dtype=jnp.bfloat16) -> jax.Array:
    """Full dequantization via XLA (reference path for the Pallas kernels).

    Returns the weight in ORIGINAL row order (scatters permuted rows back
    when ``pw.perm`` is set).
    """
    pw = resolve_double_quant(pw)
    if pw.layout == "u4_kpack_sc":
        pw = u4k_strip_scales(pw)
    K, N = pw.orig_shape
    G = pw.group_size if pw.group_size > 0 else K
    w = _dequantize_packed_arrays(
        pw.packed, pw.scales, pw.zeros, pw.bits, G, pw.dtype, pw.layout, K,
        jnp.dtype(out_dtype))
    if pw.perm is not None:
        # stored row i == original row perm[i]
        w = jnp.zeros_like(w).at[pw.perm].set(w)
    return w


# ---------------------------------------------------------------------------
# GPTQ / optimum layout interchange
# ---------------------------------------------------------------------------
# The optimum/AutoGPTQ checkpoint layout (documented in the reference at
# weight_only/modules.py:195-268): for a torch Linear [out=N, in=K],
#   qweight: int32 [K/8, N], row i packs input rows 8i..8i+7, nibble s = row 8i+s
#   qzeros:  int32 [K/G, N/8], stores (zero_point - 1), packed along N
#   scales:  fp16  [K/G, N]
#   g_idx:   int32 [K] mapping each input row to its group (act-order support)


def from_gptq_layout(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                     g_idx: np.ndarray | None, bits: int = 4,
                     sym: bool = False) -> PackedWeight:
    """Convert an optimum/AutoGPTQ checkpoint tensor set to PackedWeight.

    Handles act-order (``g_idx``) by inverse-permuting rows back to natural
    order is NOT done here — GPTQ with act_order stores rows in natural order
    with per-row group indices; we materialize per-row scales via g_idx only
    when groups are non-contiguous.
    """
    from . import native

    qweight = np.asarray(qweight)
    Kp8, N = qweight.shape
    K = Kp8 * (32 // bits)
    mask = (1 << bits) - 1
    # native multi-threaded unpack (checkpoint-import hot path)
    codes = native.unpack_gptq_qweight(qweight.astype(np.int32),
                                       bits).astype(np.int32)

    zp_planes = [((np.asarray(qzeros) >> (bits * s)) & mask) for s in range(32 // bits)]
    zeros = np.stack(zp_planes, axis=2).reshape(qzeros.shape[0], -1).astype(np.int32)
    zeros = zeros + 1  # optimum stores zero-1
    scales = np.asarray(scales, dtype=np.float32)
    ng = scales.shape[0]
    G = K // ng
    # convert to the centered convention (see qtensor.quantize_int_asym)
    half = 1 << (bits - 1)
    codes = codes - half
    zeros = zeros - half

    perm = None
    if g_idx is not None and not np.array_equal(
        np.asarray(g_idx), np.arange(K) // G
    ):
        # Non-contiguous groups (act-order): regroup by stable-sorting rows
        # by group index; record the permutation for the matmul. GPTQ groups
        # always have exactly G members, so sorted groups are contiguous.
        gi = np.asarray(g_idx).astype(np.int64)
        counts = np.bincount(gi, minlength=ng)
        if not np.all(counts == G):
            raise ValueError(
                f"g_idx groups are not uniformly sized (G={G}): "
                f"{counts.min()}..{counts.max()}")
        perm = np.argsort(gi, kind="stable").astype(np.int32)
        codes = codes[perm]

    codes_j = jnp.asarray(codes.astype(np.int8))
    qt = QTensor(codes_j, jnp.asarray(scales), jnp.asarray(zeros, dtype=jnp.float32)
                 if not sym else None, "int", bits, G, (K, N))
    return pack_qtensor(qt, perm=perm)


def from_awq_layout(qweight: np.ndarray, qzeros: np.ndarray,
                    scales: np.ndarray, bits: int = 4,
                    group_size: int | None = None) -> PackedWeight:
    """Convert an AutoAWQ ("gemm") checkpoint tensor set to PackedWeight.

    AWQ layout (reference ``unpack_awq``, weight_only/utility.py:1275):
    ``qweight`` int32 [K, N/8] with 8 nibbles along N in the AWQ
    interleave order [0, 2, 4, 6, 1, 3, 5, 7]; ``qzeros`` int32
    [K/G, N/8] in the same order; ``scales`` [K/G, N]. Semantics are
    ``w = (q - z) * scale`` with NO off-by-one on the zero points (unlike
    the optimum/GPTQ layout)."""
    assert bits == 4, "AWQ gemm checkpoints are 4-bit"
    qweight = np.asarray(qweight).astype(np.int64)
    qzeros = np.asarray(qzeros).astype(np.int64)
    K, N8 = qweight.shape
    N = N8 * 8
    mask = (1 << bits) - 1

    def unpack_cols(words, rows):
        raw = np.stack([(words >> (bits * s)) & mask for s in range(8)],
                       axis=2).reshape(rows, N)
        # logical[:, i] = raw[:, rev[i]], rev per-8 = inverse of the AWQ
        # order map [0,2,4,6,1,3,5,7]
        rev = (np.arange(N).reshape(-1, 8)[:, [0, 4, 1, 5, 2, 6, 3, 7]]
               ).reshape(-1)
        return raw[:, rev]

    codes = unpack_cols(qweight, K).astype(np.int32)
    zeros = unpack_cols(qzeros, qzeros.shape[0]).astype(np.int32)
    scales = np.asarray(scales, dtype=np.float32)
    ng = scales.shape[0]
    G = K // ng
    if group_size and group_size > 0 and G != group_size:
        raise ValueError(
            f"AWQ checkpoint tensors imply group_size={G} "
            f"(K={K}, {ng} scale groups) but config says {group_size}")
    half = 1 << (bits - 1)
    codes = codes - half  # centered convention (qtensor.quantize_int_asym)
    zeros = zeros - half

    qt = QTensor(jnp.asarray(codes.astype(np.int8)), jnp.asarray(scales),
                 jnp.asarray(zeros, dtype=jnp.float32), "int", bits, G,
                 (K, N))
    return pack_qtensor(qt)


def to_gptq_layout(pw: PackedWeight) -> dict[str, np.ndarray]:
    """Export PackedWeight to the optimum/AutoGPTQ tensor layout."""
    if pw.dtype in FLOAT_CODE_DTYPES:
        raise ValueError(
            f"GPTQ layout has integer semantics; cannot export codebook "
            f"dtype {pw.dtype!r} (indices would decode as garbage)")
    pw = resolve_double_quant(pw)
    K, N = pw.orig_shape
    bits = pw.bits
    pf = 32 // bits
    codes = np.asarray(unpack_to_codes(pw)).astype(np.int64)
    G_eff = pw.group_size if pw.group_size > 0 else K
    if pw.perm is not None:
        # stored row i == original row perm[i]: scatter back, emit g_idx
        perm = np.asarray(pw.perm)
        orig = np.empty_like(codes)
        orig[perm] = codes
        codes = orig
        g_idx_out = np.empty((K,), dtype=np.int32)
        g_idx_out[perm] = (np.arange(K) // G_eff).astype(np.int32)
    else:
        g_idx_out = (np.arange(K) // G_eff).astype(np.int32)
    half = 1 << (bits - 1)
    codes = codes + half  # centered -> unsigned
    if pw.zeros is None:
        zeros = np.full((pw.scales.shape[0], N), half, dtype=np.int64)
    else:
        zeros = np.asarray(pw.zeros).astype(np.int64) + half
    mask = (1 << bits) - 1
    qweight = np.zeros((K // pf, N), dtype=np.int64)
    for s in range(pf):
        qweight |= (codes[s::pf] & mask) << (bits * s)
    # interleave: row 8i+s must live in word i nibble s → codes[s::pf] has rows
    # s, s+pf, ... which is exactly word index i = row//pf for rows ≡ s (mod pf)
    zeros_m1 = (zeros - 1) & mask
    qzeros = np.zeros((zeros.shape[0], N // pf), dtype=np.int64)
    for s in range(pf):
        qzeros |= zeros_m1[:, s::pf] << (bits * s)
    return {
        "qweight": qweight.astype(np.int32),
        "qzeros": qzeros.astype(np.int32),
        "scales": np.asarray(pw.scales).astype(np.float16),
        "g_idx": g_idx_out,
    }
