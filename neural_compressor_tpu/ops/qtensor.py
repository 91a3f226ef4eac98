"""Group-wise quantization math — the numeric core of the engine.

Pure ``jnp`` functions (jit/vmap/pjit friendly) over weights of shape
``[K, N]`` (``in_features x out_features``, JAX convention: ``y = x @ w``).
Quantization groups run along the **reduction** axis K: with group size G the
scales/zeros have shape ``[K/G, N]``.

Parity target (re-designed, not translated): the reference's ``quant_tensor``
family — neural_compressor/torch/algorithms/weight_only/utility.py:112-533
(``qdq_weight_sym``, ``qdq_weight_asym``, ``quantize_4bit`` NF4/FP4 codebooks,
``search_clip`` MSE clip search, ``quant_weight_w_scale``) — rebuilt as
functional transforms with static shapes so XLA can fuse everything.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Codebooks for float4 / nf4 data types.
# Values follow the public definitions: NF4 from the QLoRA paper (normalized
# quantiles of N(0,1)); FP4 = e2m1 value grid.
#
# Stored as NUMPY constants and converted to device arrays LAZILY on first
# CODEBOOKS[...] access: importing the package must not initialize the JAX
# backend — on multi-host deployments ``jax.distributed.initialize`` has to
# run before any backend touch (tests/test_multiprocess_distributed.py).
# ---------------------------------------------------------------------------

import numpy as _np

NF4_CODEBOOK = _np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=_np.float32,
)

FP4_CODEBOOK = _np.array(
    [-12.0, -8.0, -6.0, -4.0, -3.0, -2.0, -1.0, 0.0,
     1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0],
    dtype=_np.float32,
) / _np.float32(12.0)


class _LazyCodebooks(dict):
    """dict whose (numpy) values convert to jnp arrays on ACCESS
    (import-time backend-init avoidance; see module comment). No caching:
    a conversion made inside a jit trace would leak a tracer to later
    callers — 16-element constants convert for free."""

    def __getitem__(self, k):
        return jnp.asarray(super().__getitem__(k))

    def host(self, k):
        """The raw numpy codebook (for baking into kernel closures —
        under a jit trace ``[k]`` would hand back a tracer)."""
        return dict.__getitem__(self, k)


CODEBOOKS = _LazyCodebooks(
    {"nf4": NF4_CODEBOOK, "fp4": FP4_CODEBOOK, "fp4_e2m1": FP4_CODEBOOK})

INT_DTYPES = ("int", "int8", "int4", "int2")
FLOAT_CODE_DTYPES = tuple(CODEBOOKS.keys())
FP8_DTYPES = ("fp8_e4m3", "fp8_e5m2")


class QTensor(NamedTuple):
    """A group-quantized tensor (pre-packing).

    ``codes``: integer codes, int8 (sym int / codebook index / asym unsigned).
    ``scales``: per-(group, out-channel), shape [K/G, N], float32.
    ``zeros``: optional zero points (asym), same shape as scales, else None.
    ``dtype``: logical quant dtype ("int", "nf4", "fp4", ...).
    ``bits``: bit width.
    ``group_size``: group length along K (-1 = whole-K per-channel).
    ``orig_shape``: original [K, N] before padding.
    """

    codes: jax.Array
    scales: jax.Array
    zeros: jax.Array | None
    dtype: str
    bits: int
    group_size: int
    orig_shape: tuple[int, int]


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def _resolve_group(K: int, group_size: int) -> int:
    if group_size in (-1, 0) or group_size >= K:
        return K
    return group_size


def _pad_to_group(w: jax.Array, G: int) -> jax.Array:
    K = w.shape[0]
    rem = K % G
    if rem:
        w = jnp.pad(w, ((0, G - rem), (0, 0)))
    return w


def _grouped(w: jax.Array, G: int) -> jax.Array:
    """[K, N] -> [K/G, G, N] (pads K to a multiple of G with zeros)."""
    w = _pad_to_group(w, G)
    K, N = w.shape
    return w.reshape(K // G, G, N)


def _ungroup(wg: jax.Array, orig_K: int) -> jax.Array:
    ng, G, N = wg.shape
    return wg.reshape(ng * G, N)[:orig_K]


# ---------------------------------------------------------------------------
# Integer quantization
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bits", "G", "full_range"))
def _int_sym_arrays(w, bits, G, full_range):
    wg = _grouped(w.astype(jnp.float32), G)
    qmax = 2 ** (bits - 1) - 1
    qmin = -(2 ** (bits - 1))
    amax = jnp.max(wg, axis=1)
    amin = jnp.min(wg, axis=1)
    if full_range:
        scale = jnp.maximum(amax / qmax, amin / qmin)
        lo = qmin
    else:
        scale = jnp.maximum(jnp.abs(amax), jnp.abs(amin)) / qmax
        lo = -qmax
    scale = jnp.where(scale <= 0, 1.0, scale)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), lo, qmax)
    codes = q.astype(jnp.int8).reshape(-1, wg.shape[-1])
    return codes, scale


def quantize_int_sym(
    w: jax.Array, bits: int = 4, group_size: int = 32, full_range: bool = False
) -> QTensor:
    """Symmetric signed-integer group quantization.

    ``full_range=False``: codes in [-(2^(b-1)-1), 2^(b-1)-1].
    ``full_range=True``: exploit the extra negative code -2^(b-1) when the
    group max magnitude is on the negative side (reference
    weight_only/utility.py:199-243 semantics).
    """
    if bits < 2:
        raise ValueError("bits must be >= 2 (1-bit sym has qmax=0)")
    K, N = w.shape
    G = _resolve_group(K, group_size)
    codes, scale = _int_sym_arrays(w, bits, G, full_range)
    return QTensor(codes, scale, None, "int", bits, G, (K, N))


@functools.partial(jax.jit, static_argnames=("bits", "G"))
def _int_asym_arrays(w, bits, G):
    wg = _grouped(w.astype(jnp.float32), G)
    qmax = 2**bits - 1
    half = 2 ** (bits - 1)
    amax = jnp.max(wg, axis=1)
    amin = jnp.min(wg, axis=1)
    scale = (amax - amin) / qmax
    scale = jnp.where(scale <= 0, 1.0, scale)
    zero = jnp.round(-amin / scale)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]) + zero[:, None, :], 0, qmax)
    codes = (q - half).astype(jnp.int8).reshape(-1, wg.shape[-1])
    return codes, scale, zero - half


def quantize_int_asym(w: jax.Array, bits: int = 4, group_size: int = 32) -> QTensor:
    """Asymmetric group quantization with zero points.

    Codes and zero points are stored **centered** (shifted by -2^(b-1)) so
    codes always fit signed int8 and pack as two's complement; dequantization
    ``(q - z) * s`` is invariant under the common shift.
    """
    if bits < 2:
        raise ValueError("bits must be >= 2")
    K, N = w.shape
    G = _resolve_group(K, group_size)
    codes, scale, zeros = _int_asym_arrays(w, bits, G)
    return QTensor(codes, scale, zeros, "int", bits, G, (K, N))


# ---------------------------------------------------------------------------
# Codebook (NF4 / FP4) quantization
# ---------------------------------------------------------------------------

def _codebook_nearest(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Indices of nearest codebook entries (codebook sorted ascending)."""
    mids = (codebook[1:] + codebook[:-1]) / 2.0
    return jnp.searchsorted(mids, x, side="right").astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("dtype", "G"))
def _codebook_arrays(w, dtype, G):
    codebook = CODEBOOKS[dtype]
    wg = _grouped(w.astype(jnp.float32), G)
    scale = jnp.max(jnp.abs(wg), axis=1)
    scale = jnp.where(scale <= 0, 1.0, scale)
    normed = wg / scale[:, None, :]
    codes = _codebook_nearest(normed, codebook).reshape(-1, wg.shape[-1])
    return codes, scale


def quantize_codebook(w: jax.Array, dtype: str = "nf4",
                      group_size: int = 32) -> QTensor:
    """NF4/FP4 group quantization: normalize by group absmax, snap to codebook."""
    K, N = w.shape
    G = _resolve_group(K, group_size)
    codes, scale = _codebook_arrays(w, dtype, G)
    return QTensor(codes, scale, None, dtype, 4, G, (K, N))


# ---------------------------------------------------------------------------
# Dequantization (shared)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dtype", "G", "K", "out_dtype"))
def _dequantize_arrays(codes, scales, zeros, dtype, G, K, out_dtype):
    N = codes.shape[-1]
    codes = codes.reshape(-1, G, N)
    if dtype in FLOAT_CODE_DTYPES:
        codebook = CODEBOOKS[dtype]
        vals = codebook[codes.astype(jnp.int32)]
    else:
        vals = codes.astype(jnp.float32)
        if zeros is not None:
            vals = vals - zeros[:, None, :]
    w = vals * scales[:, None, :]
    return _ungroup(w, K).astype(out_dtype)


def dequantize(qt: QTensor, out_dtype=jnp.float32) -> jax.Array:
    """Reconstruct the (fake-quantized) weight from a QTensor."""
    K, N = qt.orig_shape
    return _dequantize_arrays(qt.codes, qt.scales, qt.zeros, qt.dtype,
                              qt.group_size, K, jnp.dtype(out_dtype))


# ---------------------------------------------------------------------------
# One-call QDQ + dispatcher (the reference's `quant_tensor` equivalent)
# ---------------------------------------------------------------------------

def quantize_tensor(
    w: jax.Array,
    bits: int = 4,
    group_size: int = 32,
    scheme: str = "sym",
    dtype: str = "int",
    full_range: bool = False,
) -> QTensor:
    """Dispatch on dtype/scheme. ``dtype`` in {"int", "int4", ..., "nf4", "fp4"}."""
    if dtype in FLOAT_CODE_DTYPES:
        return quantize_codebook(w, dtype=dtype, group_size=group_size)
    if dtype in FP8_DTYPES:
        raise ValueError(
            f"{dtype!r} weights go through the FP8 flow (algorithms/fp8), "
            "not quantize_tensor")
    if dtype != "int":
        if not (dtype.startswith("int") and dtype[3:].isdigit()):
            raise ValueError(
                f"unknown quant dtype {dtype!r}; expected one of "
                f"{INT_DTYPES + FLOAT_CODE_DTYPES}")
        bits = int(dtype[3:])
    if scheme == "sym":
        return quantize_int_sym(w, bits=bits, group_size=group_size, full_range=full_range)
    return quantize_int_asym(w, bits=bits, group_size=group_size)


def qdq_tensor(w, bits=4, group_size=32, scheme="sym", dtype="int",
               full_range=False, out_dtype=None):
    """Fake-quantize: quantize then dequantize, preserving dtype by default."""
    out_dtype = out_dtype or w.dtype
    qt = quantize_tensor(w, bits=bits, group_size=group_size, scheme=scheme,
                         dtype=dtype, full_range=full_range)
    return dequantize(qt, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "scheme"))
def quantize_with_scale(w: jax.Array, scales: jax.Array, zeros: jax.Array | None,
                        bits: int, group_size: int, scheme: str = "sym") -> jax.Array:
    """Quantize ``w`` using externally supplied scales/zeros (GPTQ/AWQ path).

    Parity: reference ``quant_weight_w_scale`` (weight_only/utility.py:483-533).
    Returns int8 codes of shape [K, N].
    """
    K, N = w.shape
    G = _resolve_group(K, group_size)
    wg = _grouped(w.astype(jnp.float32), G)
    if scheme == "sym":
        qmax = 2 ** (bits - 1) - 1
        q = jnp.clip(jnp.round(wg / scales[:, None, :]), -qmax - 1, qmax)
    else:
        # zeros follow the centered convention (see quantize_int_asym)
        qmax = 2**bits - 1
        half = 2 ** (bits - 1)
        z = zeros if zeros is not None else jnp.zeros_like(scales)
        q = jnp.clip(
            jnp.round(wg / scales[:, None, :]) + (z[:, None, :] + half), 0, qmax
        ) - half
    return q.astype(jnp.int8).reshape(-1, N)[:K]


# ---------------------------------------------------------------------------
# MSE clip-ratio search
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "scheme", "dtype", "n_grid", "max_shrink"),
)
def search_clip(
    w: jax.Array,
    bits: int = 4,
    group_size: int = 32,
    scheme: str = "sym",
    dtype: str = "int",
    n_grid: int = 20,
    max_shrink: float = 0.8,
) -> jax.Array:
    """Per-(group, channel) best clip ratio minimizing QDQ MSE.

    Mirrors the reference's grid search (weight_only/utility.py:439-481):
    ratios r in (max_shrink, 1.0], quantize clip(w, ±r·absmax), keep the
    argmin-MSE ratio. Vectorized over the grid with ``vmap``.
    """
    K, N = w.shape
    G = _resolve_group(K, group_size)
    wg = _grouped(w.astype(jnp.float32), G)  # [ng, G, N]
    absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
    ratios = 1.0 - jnp.arange(n_grid, dtype=jnp.float32) * ((1.0 - max_shrink) / n_grid)

    def qdq_with_ratio(r):
        clipped = jnp.clip(wg, -absmax * r, absmax * r)
        flat = clipped.reshape(-1, N)
        out = qdq_tensor(flat, bits=bits, group_size=G, scheme=scheme, dtype=dtype)
        return jnp.sum((out.reshape(wg.shape) - wg) ** 2, axis=1)  # [ng, N]

    errs = jax.vmap(qdq_with_ratio)(ratios)  # [n_grid, ng, N]
    best = jnp.argmin(errs, axis=0)  # [ng, N]
    return ratios[best]  # [ng, N]


# ---------------------------------------------------------------------------
# Activation quantization (for W8A8 / dynamic paths)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bits",))
def quantize_act_per_tensor(x: jax.Array, bits: int = 8,
                            scale: jax.Array | None = None):
    """Per-tensor symmetric activation quantization. If ``scale`` is None the
    scale is computed dynamically from the batch (dynamic quantization)."""
    qmax = 2 ** (bits - 1) - 1
    x = x.astype(jnp.float32)  # bf16 scale/round noise rivals the int8 step
    if scale is None:
        scale = jnp.max(jnp.abs(x)) / qmax
        scale = jnp.where(scale <= 0, 1.0, scale)
    q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax).astype(jnp.int8)
    return q, scale


@functools.partial(jax.jit, static_argnames=("bits",))
def quantize_act_per_token(x: jax.Array, bits: int = 8):
    """Per-token (row-wise) symmetric dynamic activation quantization."""
    qmax = 2 ** (bits - 1) - 1
    x = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / qmax
    scale = jnp.where(scale <= 0, 1.0, scale)
    q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax).astype(jnp.int8)
    return q, scale
