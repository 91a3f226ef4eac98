"""Microscaling (MX) format quantization math.

Parity target: reference mx_quant (neural_compressor/torch/algorithms/
mx_quant/utils.py — ``ElemFormat``:30, ``_shared_exponents``:250,
``_quantize_mx``:499) per the OCP MX spec: a shared power-of-2 exponent per
32-element block along the reduction dim, with elements stored in a narrow
format (fp8 e4m3/e5m2, fp6 e3m2/e2m3, fp4 e2m1, int8). All pure jnp, jitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# name -> (ebits, mbits, emax, max_norm)  [element formats]
_ELEM_FORMATS = {
    "fp8_e4m3": (4, 3, 8, 448.0),
    "fp8_e5m2": (5, 2, 15, 57344.0),
    "fp6_e3m2": (3, 2, 4, 28.0),
    "fp6_e2m3": (2, 3, 2, 7.5),
    "fp4": (2, 1, 2, 6.0),
    "fp4_e2m1": (2, 1, 2, 6.0),
    "int8": (0, 8, 0, 127.0),
    "int4": (0, 4, 0, 7.0),
}


def mx_format_info(name: str):
    key = name.replace("mxfp8", "fp8").replace("mxfp6", "fp6").replace(
        "mxfp4", "fp4").replace("mxint", "int")
    if key in ("fp8",):
        key = "fp8_e4m3"
    return _ELEM_FORMATS[key]


def _quantize_elem_fp(x, ebits: int, mbits: int, max_norm: float):
    """Round x to a tiny float grid with ``mbits`` mantissa bits (incl.
    implicit leading one) and clamp to ±max_norm. Subnormals flush via the
    min-exponent floor."""
    a = jnp.abs(x)
    emin = -(2 ** (ebits - 1)) + 2
    e = jnp.floor(jnp.log2(jnp.where(a == 0, 1.0, a)))
    e = jnp.maximum(e, emin)
    ulp = jnp.exp2(e - (mbits - 1))
    q = jnp.round(x / ulp) * ulp
    return jnp.clip(q, -max_norm, max_norm)


def _quantize_elem_int(x, bits: int):
    qmax = 2 ** (bits - 1) - 1
    return jnp.clip(jnp.round(x), -qmax - 1, qmax)


@functools.partial(jax.jit, static_argnames=("block_size", "axis"))
def quantize_nvfp4(x: jax.Array, block_size: int = 16,
                   axis: int = -1) -> jax.Array:
    """QDQ ``x`` in NVFP4 (reference docs/PT_NVFP4Quant.md; the reference
    delegates the math to the external auto-round package — implemented
    natively here): e2m1 elements over 16-element blocks along ``axis``,
    with a REAL fp8-e4m3 scale per block (not MX's pow2 exponent) plus one
    global fp32 scale that places block scales in e4m3 range. The e4m3
    mantissa on the scale is what gives NVFP4 its accuracy edge over mxfp4.
    """
    axis = axis % x.ndim
    x32 = x.astype(jnp.float32)
    perm = [i for i in range(x.ndim) if i != axis] + [axis]
    inv = [perm.index(i) for i in range(x.ndim)]
    xt = jnp.transpose(x32, perm)
    L = xt.shape[-1]
    pad = (-L) % block_size
    xp = jnp.pad(xt, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    blk = xp.reshape(*xp.shape[:-1], (L + pad) // block_size, block_size)

    # global scale: block amax / 6 must fit e4m3's 448 after division
    gmax = jnp.max(jnp.abs(blk))
    gscale = jnp.where(gmax == 0, 1.0, gmax / (448.0 * 6.0))
    amax = jnp.max(jnp.abs(blk), axis=-1, keepdims=True)
    bscale = _quantize_elem_fp(amax / 6.0 / gscale, 4, 3 + 1, 448.0)
    eff = jnp.where(bscale == 0, 1.0, bscale * gscale)
    q = _quantize_elem_fp(blk / eff, 2, 1 + 1, 6.0)  # e2m1 grid
    out = (q * eff).reshape(*xp.shape[:-1], L + pad)[..., :L]
    return jnp.transpose(out, inv).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("elem_format", "block_size",
                                             "axis", "round_method"))
def quantize_mx(x: jax.Array, elem_format: str = "fp8_e4m3",
                block_size: int = 32, axis: int = -1,
                round_method: str = "nearest") -> jax.Array:
    """QDQ ``x`` in an MX format: shared pow2 exponent per block along
    ``axis``, elements in ``elem_format``. ``elem_format="nvfp4"`` routes
    to :func:`quantize_nvfp4` (e4m3 block scales, block 16 by default).
    Returns same-shape array."""
    if elem_format == "nvfp4":
        return quantize_nvfp4(x, block_size=min(block_size, 16), axis=axis)
    ebits, mbits, emax, max_norm = mx_format_info(elem_format)
    axis = axis % x.ndim
    x32 = x.astype(jnp.float32)
    # move target axis last, pad to block multiple
    perm = [i for i in range(x.ndim) if i != axis] + [axis]
    inv = [perm.index(i) for i in range(x.ndim)]
    xt = jnp.transpose(x32, perm)
    L = xt.shape[-1]
    pad = (-L) % block_size
    xp = jnp.pad(xt, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    blk = xp.reshape(*xp.shape[:-1], (L + pad) // block_size, block_size)

    amax = jnp.max(jnp.abs(blk), axis=-1, keepdims=True)
    # shared exponent: floor(log2(amax)) - emax of the element format
    shexp = jnp.floor(jnp.log2(jnp.where(amax == 0, 1.0, amax)))
    scale = jnp.exp2(shexp - (jnp.floor(jnp.log2(max_norm))
                              if ebits else (mbits - 2)))
    scaled = blk / scale
    if ebits:
        q = _quantize_elem_fp(scaled, ebits, mbits + 1, max_norm)
    else:
        q = _quantize_elem_int(scaled, mbits)
    out = (q * scale).reshape(*xp.shape[:-1], L + pad)[..., :L]
    return jnp.transpose(out, inv).astype(x.dtype)
