"""Fused decode attention Pallas kernel.

One kernel per layer replaces the ~12-op decode attention path (cache
dynamic_update_slice ×2, masked QK^T, softmax, PV, layout fiddling): the
new K/V row is written into the cache **in place** (input_output_aliases)
and attention over the cache runs entirely in VMEM. Per-op dispatch
overhead is the dominant decode cost at batch 1 (~180µs/layer measured),
so collapsing the op count is the lever — the math itself is tiny
(T·D ≈ 64 KB per head).

Cache layout: [B, H_kv, T, D] head-major (model zoo convention). GQA: the
``rep`` query heads of each KV head are processed together in one program.

Also provides the int8-cache variant (QuantKVCache): codes + per-(head,
token) scales, quantizing the new row in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(pos_ref, q_ref, kn_ref, vn_ref, kc_in, vc_in, kc_ref, vc_ref,
            o_ref, *, T, D, rep, scale):
    b = pl.program_id(0)
    pos = pos_ref[b, 0]  # per-slot position (continuous batching)
    # write the new row via a masked select — Mosaic cannot prove alignment
    # of a dynamic single-row store, but a full-tile select vectorizes
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    k = jnp.where(row == pos, kn_ref[:].astype(kc_in.dtype), kc_in[:])
    v = jnp.where(row == pos, vn_ref[:].astype(vc_in.dtype), vc_in[:])
    kc_ref[:] = k
    vc_ref[:] = v
    q = q_ref[:]   # [rep, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [rep, T]
    s = s * scale
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (rep, T), 1)
    s = jnp.where(t_idx <= pos, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [rep, D]
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attn_impl(pos, q, k_new, v_new, k_cache, v_cache, interpret):
    B, Hkv, T, D = k_cache.shape
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    rep = q.shape[1] // Hkv
    qr = q.reshape(B, Hkv, rep, D)
    # Mosaic compiles sublane-unaligned (1 < rep < 8) q blocks pathologically
    # slowly (~40 s/call site); pad the query group to 8 rows.
    rep_p = rep if rep == 1 else -(-rep // 8) * 8  # ceil to sublane multiple
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    scale = 1.0 / (D ** 0.5)

    spec_bh = lambda shape: pl.BlockSpec(
        (None, None) + shape, lambda b, h: (b, h) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, T=T, D=D, rep=rep_p, scale=scale)
    kc2, vc2, out = pl.pallas_call(
        kernel,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos (1,1)
            spec_bh((rep_p, D)),  # q (padded to >=8 sublanes when grouped)
            spec_bh((1, D)),     # k_new (length-1 token axis kept so the
            spec_bh((1, D)),     # v_new  sublane dim equals the array dim)
            spec_bh((T, D)),     # k_cache
            spec_bh((T, D)),     # v_cache
        ],
        out_specs=[spec_bh((T, D)), spec_bh((T, D)), spec_bh((rep_p, D))],
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(qr.shape, q.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(pos.reshape(B, 1), qr, k_new, v_new, k_cache, v_cache)
    if rep_p != rep:
        out = out[:, :, :rep]
    return kc2, vc2, out.reshape(B, Hkv * rep, 1, D)


def _kernel_q(pos_ref, q_ref, kn_ref, vn_ref, kc_in, ks_in, vc_in, vs_in,
              kc_ref, ks_ref, vc_ref, vs_ref, o_ref, *, T, D, rep, scale):
    b = pl.program_id(0)
    pos = pos_ref[b, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    # quantize the new row in-kernel: per-(token, head) sym int8
    kn = kn_ref[:].astype(jnp.float32)  # [1, D]
    vn = vn_ref[:].astype(jnp.float32)
    ks_new = jnp.maximum(jnp.max(jnp.abs(kn)), 1e-6) / 127.0
    vs_new = jnp.maximum(jnp.max(jnp.abs(vn)), 1e-6) / 127.0
    kn_q = jnp.clip(jnp.round(kn / ks_new), -127, 127).astype(jnp.int8)
    vn_q = jnp.clip(jnp.round(vn / vs_new), -127, 127).astype(jnp.int8)
    k_codes = jnp.where(row == pos, kn_q, kc_in[:])
    v_codes = jnp.where(row == pos, vn_q, vc_in[:])
    # scales ride a [1, T] (lane-major) block: a [T, 1] operand would
    # lane-pad 1 -> 128 and XLA re-materializes the reshape per layer
    # per step (the paged-path phantom, kvscale_copy_hlo.py)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    k_scale = jnp.where(col == pos, ks_new, ks_in[:])  # [1, T]
    v_scale = jnp.where(col == pos, vs_new, vs_in[:])
    kc_ref[:] = k_codes
    vc_ref[:] = v_codes
    ks_ref[:] = k_scale
    vs_ref[:] = v_scale

    # fold the per-token scales into the scores/probs instead of
    # dequantizing every cache element: per-element work is a bare cast
    kb = k_codes.astype(jnp.bfloat16)   # [T, D]
    vb = v_codes.astype(jnp.bfloat16)
    q = q_ref[:]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [rep, T]
    s = s * (k_scale[0] * scale)[None, :]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (rep, T), 1)
    s = jnp.where(t_idx <= pos, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    p = p * v_scale[0][None, :]         # fold v scales into the probs
    o = jax.lax.dot_general(p.astype(jnp.bfloat16), vb,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attn_quant_impl(pos, q, k_new, v_new, k_codes, k_scale, v_codes,
                            v_scale, interpret):
    B, Hkv, T, D = k_codes.shape
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    rep = q.shape[1] // Hkv
    qr = q.reshape(B, Hkv, rep, D)
    rep_p = rep if rep == 1 else -(-rep // 8) * 8  # ceil to sublane multiple
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    scale = 1.0 / (D ** 0.5)
    # [B, Hkv, 1, T]: lane-major scales — a [..., T, 1] operand would
    # lane-pad 1 -> 128 (128x physical) and XLA re-materializes it per
    # layer per step (kvscale_copy_hlo.py; the paged-path phantom)
    ks4 = k_scale[:, :, None, :].astype(jnp.float32)
    vs4 = v_scale[:, :, None, :].astype(jnp.float32)

    spec_bh = lambda shape: pl.BlockSpec(
        (None, None) + shape, lambda b, h: (b, h) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_q, T=T, D=D, rep=rep_p, scale=scale)
    kc2, ks2, vc2, vs2, out = pl.pallas_call(
        kernel,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec_bh((rep_p, D)),
            spec_bh((1, D)),
            spec_bh((1, D)),
            spec_bh((T, D)),   # k codes
            spec_bh((1, T)),   # k scales
            spec_bh((T, D)),   # v codes
            spec_bh((1, T)),   # v scales
        ],
        out_specs=[spec_bh((T, D)), spec_bh((1, T)), spec_bh((T, D)),
                   spec_bh((1, T)), spec_bh((rep_p, D))],
        out_shape=[
            jax.ShapeDtypeStruct(k_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(ks4.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(vs4.shape, jnp.float32),
            jax.ShapeDtypeStruct(qr.shape, q.dtype),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(pos.reshape(B, 1), qr, k_new, v_new, k_codes, ks4, v_codes, vs4)
    if rep_p != rep:
        out = out[:, :, :rep]
    return (kc2, ks2[:, :, 0], vc2, vs2[:, :, 0],
            out.reshape(B, Hkv * rep, 1, D))


# ---------------------------------------------------------------------------
# Read-only attention kernels: the cache row update happens OUTSIDE the
# kernel (XLA dynamic_update_slice writes one row in place under buffer
# donation). The aliased in-kernel write-back variants above re-DMA the full
# [T, D] cache block to HBM every step — measured as a ~20% regression for
# the int8 cache at B=1/T=1024 (PERF_NOTES round 1). Here the kernel only
# READS the cache; the new K/V row is folded into the scores via selects.
# ---------------------------------------------------------------------------

_WRITE_MODE = "outside"  # "kernel" (aliased write-back) | "outside" (DUS)


def set_cache_write_mode(mode: str) -> None:
    global _WRITE_MODE
    assert mode in ("kernel", "outside")
    _WRITE_MODE = mode


# decode attention dispatch. Measured (v5e, llama2-7b, T=1024): the fused
# kernel and the XLA einsum path tie at B=1 (12.3 ms/step), but the
# kernel's per-(batch, head) grid does NOT scale with batch — at B=8 the
# XLA path is 1.4x faster (20.3 vs 28.9 ms) and at B=16 int8-KV 2.4x
# (31.4 vs 76.8). "auto" uses the kernel only for single-row decode.
_ATTN_IMPL = "auto"  # "auto" | "kernel" | "xla"
_FUSED_ATTN_MAX_BATCH = 1


def set_decode_attn_impl(impl: str) -> None:
    global _ATTN_IMPL
    assert impl in ("auto", "kernel", "xla")
    _ATTN_IMPL = impl


def use_fused_decode_attention(batch: int = 1) -> bool:
    if _ATTN_IMPL == "auto":
        return batch <= _FUSED_ATTN_MAX_BATCH
    return _ATTN_IMPL == "kernel"


def _kernel_ro(pos_ref, q_ref, kn_ref, vn_ref, kc_in, vc_in, o_ref,
               *, T, D, rep, scale):
    b = pl.program_id(0)
    pos = pos_ref[b, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    k = jnp.where(row == pos, kn_ref[:].astype(kc_in.dtype), kc_in[:])
    v = jnp.where(row == pos, vn_ref[:].astype(vc_in.dtype), vc_in[:])
    q = q_ref[:]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (rep, T), 1)
    s = jnp.where(t_idx <= pos, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "pin"))
def _decode_attn_ro_impl(pos, q, k_new, v_new, k_cache, v_cache, interpret,
                         pin=False):
    if pin and not interpret:
        k_cache = pltpu.with_memory_space_constraint(k_cache, pltpu.HBM)
        v_cache = pltpu.with_memory_space_constraint(v_cache, pltpu.HBM)
    B, Hkv, T, D = k_cache.shape
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    rep = q.shape[1] // Hkv
    qr = q.reshape(B, Hkv, rep, D)
    rep_p = rep if rep == 1 else -(-rep // 8) * 8  # ceil to sublane multiple
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    scale = 1.0 / (D ** 0.5)

    spec_bh = lambda shape: pl.BlockSpec(
        (None, None) + shape, lambda b, h: (b, h) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_ro, T=T, D=D, rep=rep_p, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec_bh((rep_p, D)),
            spec_bh((1, D)),
            spec_bh((1, D)),
            spec_bh((T, D)),
            spec_bh((T, D)),
        ],
        out_specs=spec_bh((rep_p, D)),
        out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(pos.reshape(B, 1), qr, k_new, v_new, k_cache, v_cache)
    if rep_p != rep:
        out = out[:, :, :rep]
    return out.reshape(B, Hkv * rep, 1, D)


_RO_CACHE_SPACE = "vmem"  # "vmem" | "hbm" (manual DMA) | "pin" (see below)


def set_ro_cache_space(space: str) -> None:
    """Where the read-only decode-attention kernel's cache operands live:
    "vmem" lets XLA block/stage them (MSA may pre-copy each layer's cache
    into VMEM); "hbm" pins them to HBM and the kernel issues ONE big DMA
    per cache itself; "pin" keeps the blocked-VMEM kernel but pins the
    operand buffers to HBM (Mosaic pipelines the blocks, MSA cannot
    pre-stage). A/B lever for the MSA-staging cost found in the round-3
    llama3 profile (950 us/step of latency-bound cache copies)."""
    global _RO_CACHE_SPACE
    assert space in ("vmem", "hbm", "pin")
    _RO_CACHE_SPACE = space


def _kernel_ro_hbm(pos_ref, q_ref, kn_ref, vn_ref, kc_hbm, vc_hbm, o_ref,
                   k_s, v_s, sem, *, Hkv, T, D, rep, scale):
    b = pl.program_id(0)
    ck = pltpu.make_async_copy(kc_hbm.at[b], k_s, sem.at[0])
    cv = pltpu.make_async_copy(vc_hbm.at[b], v_s, sem.at[1])
    ck.start()
    cv.start()
    pos = pos_ref[b]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (rep, T), 1)
    ck.wait()
    cv.wait()
    for h in range(Hkv):
        k = jnp.where(row == pos, kn_ref[b, h], k_s[h])
        v = jnp.where(row == pos, vn_ref[b, h], v_s[h])
        q = q_ref[b, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale
        s = jnp.where(t_idx <= pos, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[h] = o.astype(o_ref.dtype)


@jax.jit
def _decode_attn_ro_hbm_impl(pos, q, k_new, v_new, k_cache, v_cache):
    """RO attention with the caches pinned to HBM: the kernel DMAs each
    [Hkv, T, D] cache once (big transfer, full bandwidth) instead of XLA
    staging per-(b, h) blocks through VMEM."""
    B, Hkv, T, D = k_cache.shape
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    rep = q.shape[1] // Hkv
    qr = q.reshape(B, Hkv, rep, D)
    rep_p = rep if rep == 1 else -(-rep // 8) * 8
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    kc = pltpu.with_memory_space_constraint(k_cache, pltpu.HBM)
    vc = pltpu.with_memory_space_constraint(v_cache, pltpu.HBM)
    kernel = functools.partial(_kernel_ro_hbm, Hkv=Hkv, T=T, D=D, rep=rep_p,
                               scale=1.0 / (D ** 0.5))
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, Hkv, rep_p, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep_p, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((Hkv, T, D), k_cache.dtype),
                        pltpu.VMEM((Hkv, T, D), v_cache.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(pos, qr, k_new, v_new, kc, vc)
    if rep_p != rep:
        out = out[:, :, :rep]
    return out.reshape(B, Hkv * rep, 1, D)


_F8_VIA_BITS = True  # e4m3->bf16 via integer bit ops inside kernels


def set_f8_via_bits(on: bool) -> None:
    """A/B switch for the fp8-code conversion path (fp8_cast_ab)."""
    global _F8_VIA_BITS
    _F8_VIA_BITS = bool(on)


def _f8_bits_to_bf16(u):
    """float8_e4m3fn BITS (uint8) -> bf16, by integer exponent rebias.

    Mosaic's f8 ``astype`` costs ~3.6 us per [1024, 128] K+V block pair
    over the int8 baseline — ~115 us/layer at Hkv=32, the round-4
    "fp8-KV 36% slower than int8-KV" gap (kvquant_b1_ab). This ladder
    measured 1.1 us marginal (experiments/fp8_cast_ab.log). Exact for
    every value incl. subnormals and +-0 (asserted in fp8_cast_ab);
    e4m3fn NaN maps to a finite value, which quantized cache codes
    (clipped to +-448) never contain."""
    ui = u.astype(jnp.int32)
    s = (ui & 0x80) << 8
    e = (ui >> 3) & 0xF
    m = ui & 0x7
    normal = s | ((e + 120) << 7) | (m << 4)
    sub = jnp.where(
        m == 0, 0,
        jnp.where(m == 1, 118 << 7,
                  jnp.where(m < 4, (119 << 7) | ((m & 1) << 6),
                            (120 << 7) | ((m & 3) << 5))))
    bits = jnp.where(e > 0, normal, s | sub)
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16),
                                        jnp.bfloat16)


def _codes_bf16(x):
    """Cache codes -> bf16 for the score/output dots (int8/fp8/bf16)."""
    if x.dtype == jnp.float8_e4m3fn and _F8_VIA_BITS:
        return _f8_bits_to_bf16(jax.lax.bitcast_convert_type(x, jnp.uint8))
    return x.astype(jnp.bfloat16)


def _kernel_q_ro(pos_ref, q_ref, kn_ref, vn_ref, kc_in, ks_in, vc_in, vs_in,
                 o_ref, *, T, D, rep, scale):
    b = pl.program_id(0)
    pos = pos_ref[b, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    # fold the raw (unquantized) new row into the attention: effective
    # per-token scale at ``pos`` is 1
    kb = jnp.where(row == pos, kn_ref[:].astype(jnp.bfloat16),
                   _codes_bf16(kc_in[:]))
    vb = jnp.where(row == pos, vn_ref[:].astype(jnp.bfloat16),
                   _codes_bf16(vc_in[:]))
    # [1, T] lane-major scale blocks (see _kernel_q note)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    k_scale = jnp.where(col == pos, 1.0, ks_in[:])  # [1, T]
    v_scale = jnp.where(col == pos, 1.0, vs_in[:])
    q = q_ref[:]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (k_scale[0] * scale)[None, :]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (rep, T), 1)
    s = jnp.where(t_idx <= pos, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    p = p * v_scale[0][None, :]
    o = jax.lax.dot_general(p.astype(jnp.bfloat16), vb,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "f8bits"))
def _decode_attn_quant_ro_impl(pos, q, k_new, v_new, k_codes, k_scale,
                               v_codes, v_scale, interpret, f8bits=True):
    # ``f8bits`` only keys the jit cache: the kernel body reads the
    # module flag at trace time (set_f8_via_bits A/B)
    B, Hkv, T, D = k_codes.shape
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    rep = q.shape[1] // Hkv
    qr = q.reshape(B, Hkv, rep, D)
    rep_p = rep if rep == 1 else -(-rep // 8) * 8  # ceil to sublane multiple
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    scale = 1.0 / (D ** 0.5)
    # [B, Hkv, 1, T] lane-major scales (see _decode_attn_quant_impl)
    ks4 = k_scale[:, :, None, :].astype(jnp.float32)
    vs4 = v_scale[:, :, None, :].astype(jnp.float32)

    spec_bh = lambda shape: pl.BlockSpec(
        (None, None) + shape, lambda b, h: (b, h) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_q_ro, T=T, D=D, rep=rep_p, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec_bh((rep_p, D)),
            spec_bh((1, D)),
            spec_bh((1, D)),
            spec_bh((T, D)),
            spec_bh((1, T)),
            spec_bh((T, D)),
            spec_bh((1, T)),
        ],
        out_specs=spec_bh((rep_p, D)),
        out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(pos.reshape(B, 1), qr, k_new, v_new, k_codes, ks4, v_codes, vs4)
    if rep_p != rep:
        out = out[:, :, :rep]
    return out.reshape(B, Hkv * rep, 1, D)


def decode_attention_quant(q, k_new, v_new, cache, pos):
    """Fused single-token attention over a quantized ``QuantKVCache``
    (int8 or fp8-e4m3 codes, per-(token, head) scales). Returns
    (out [B, H, 1, D], new_cache).

    Write modes (``set_cache_write_mode``): "outside" (default) keeps the
    kernel read-only and updates the cache row with an XLA
    dynamic_update_slice (in-place under donation — no full-block rewrite);
    "kernel" is the round-1 aliased write-back variant (int8 only).
    """
    from ..models.llama import QuantKVCache, _kv_quant, _update_rows

    B, H, S, D = q.shape
    assert S == 1, "decode kernel is single-token"
    assert cache.k_codes.dtype != jnp.uint8, (
        "int4-packed caches take the grouped code-domain attention "
        "(models.llama), not the fused kernel")
    fp8 = cache.k_codes.dtype != jnp.int8
    if _WRITE_MODE == "kernel" and not fp8:
        kc, ks, vc, vs, out = _decode_attn_quant_impl(
            pos, q[:, :, 0], k_new, v_new, cache.k_codes, cache.k_scale,
            cache.v_codes, cache.v_scale, interpret=not _on_tpu())
        return out, QuantKVCache(kc, ks, vc, vs)

    interpret = not _on_tpu()
    if fp8 and interpret:
        # interpreter has no fp8 dot support: dequantize via XLA instead
        kd = (cache.k_codes.astype(jnp.float32)
              * cache.k_scale[..., None]).astype(q.dtype)
        vd = (cache.v_codes.astype(jnp.float32)
              * cache.v_scale[..., None]).astype(q.dtype)
        out = _decode_attn_ro_impl(pos, q[:, :, 0], k_new, v_new, kd, vd,
                                   interpret=True)
    else:
        out = _decode_attn_quant_ro_impl(
            pos, q[:, :, 0], k_new, v_new, cache.k_codes, cache.k_scale,
            cache.v_codes, cache.v_scale, interpret=interpret,
            f8bits=_F8_VIA_BITS)
    kc, ks = _kv_quant(k_new, fmt="fp8_e4m3" if fp8 else "int8")
    vc, vs = _kv_quant(v_new, fmt="fp8_e4m3" if fp8 else "int8")
    new_cache = QuantKVCache(
        _update_rows(cache.k_codes, kc, pos),
        _update_rows(cache.k_scale, ks, pos),
        _update_rows(cache.v_codes, vc, pos),
        _update_rows(cache.v_scale, vs, pos))
    return out, new_cache


# ---------------------------------------------------------------------------
# Batched flash-decode attention: the per-(batch, head) grid above does not
# scale with batch (B=16 int8-KV: 76.8 ms kernel vs 31.4 XLA — each program
# stages one [T, D] block, so DMAs are small and per-program overhead
# dominates). Here the (B, Hkv) axis is FLATTENED AND TILED: each program
# attends bh_tile rows at once (1-2 MB cache DMAs at full HBM bandwidth),
# chunking T with an online-softmax carry in scratch. The cache row update
# happens OUTSIDE (XLA DUS in place under donation); the kernel reads the
# already-updated cache. Consumes bf16 caches and int8/fp8 code caches with
# per-(head, token) scales folded into scores/probs.
#
# Reference counterpart: the capability the reference delegates to vLLM/HPU
# fused SDPA (torch/algorithms/fp8_quant/.../helper_modules.py:1579).
# ---------------------------------------------------------------------------


def _kernel_batched(pos_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref, o_ref,
                    acc_s, m_s, l_s, *, Tc, rep_p, nT, scale, bh_tile,
                    quant):
    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)

    for bh in range(bh_tile):
        pos = pos_ref[i * bh_tile + bh]
        kb = _codes_bf16(kc_ref[bh])                  # [Tc, D]
        q = q_ref[bh]                                 # [rep_p, D]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            s = s * ks_ref[bh][None, :]
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (rep_p, Tc), 1) + t * Tc
        valid = col <= pos
        s = jnp.where(valid, s, -1e30)
        m_old = m_s[bh, :, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        # explicit zeroing: a fully-masked chunk keeps p == 0 even when
        # m_new is still the -1e30 sentinel (exp(s - m_new) would be 1)
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_old - m_new)                # [rep_p, 1]
        l_new = l_s[bh, :, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if quant:
            p = p * vs_ref[bh][None, :]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), _codes_bf16(vc_ref[bh]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [rep_p, D]
        acc_s[bh] = acc_s[bh] * alpha + pv
        m_s[bh] = jnp.broadcast_to(m_new, m_s.shape[1:])
        l_s[bh] = jnp.broadcast_to(l_new, l_s.shape[1:])

    @pl.when(t == nT - 1)
    def _emit():
        for bh in range(bh_tile):
            o_ref[bh] = (acc_s[bh] / l_s[bh, :, 0:1]).astype(o_ref.dtype)


# experiment overrides: (bh_tile, cap_mb) — None = auto
_TILE_OVERRIDE = None


def set_batched_tiles(bh_tile=None, cap_mb=None):
    global _TILE_OVERRIDE
    _TILE_OVERRIDE = None if bh_tile is None else (bh_tile, cap_mb or 2)


def _batched_tiles(BH: int, T: int, D: int, esize: int):
    if _TILE_OVERRIDE is not None:
        want, cap_mb = _TILE_OVERRIDE
        bh_tile = next((b for b in (want, 8, 4, 2, 1) if BH % b == 0), 1)
    else:
        cap_mb = 2
        bh_tile = next((b for b in (8, 4, 2, 1) if BH % b == 0), 1)
    cap = max(1, (cap_mb * 1024 * 1024) // (bh_tile * D * esize))
    Tc = 0
    for c in range(min(T, cap), 127, -128):
        if T % c == 0 and c % 128 == 0:
            Tc = c
            break
    return bh_tile, Tc


@functools.partial(jax.jit, static_argnames=("interpret", "f8bits"))
def _batched_attn_impl(pos_bh, qr, k_cache, k_scale, v_cache, v_scale,
                       interpret, f8bits=True):
    # ``f8bits`` keys the jit cache for the set_f8_via_bits A/B
    BH, T, D = k_cache.shape
    rep_p = qr.shape[1]
    quant = k_scale is not None
    esize = jnp.dtype(k_cache.dtype).itemsize
    bh_tile, Tc = _batched_tiles(BH, T, D, esize)
    nT = T // Tc
    kernel = functools.partial(
        _kernel_batched, Tc=Tc, rep_p=rep_p, nT=nT,
        scale=1.0 / (D ** 0.5), bh_tile=bh_tile, quant=quant)
    bh3 = lambda shape: pl.BlockSpec(
        (bh_tile,) + shape, lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM)
    kv3 = lambda: pl.BlockSpec((bh_tile, Tc, D), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM)
    sc2 = lambda: pl.BlockSpec((bh_tile, Tc), lambda i, t: (i, t),
                               memory_space=pltpu.VMEM)
    dummy = pl.BlockSpec((bh_tile, 128), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
    if not quant:
        k_scale = jnp.zeros((bh_tile, 128), jnp.float32)
        v_scale = k_scale
    out = pl.pallas_call(
        kernel,
        grid=(BH // bh_tile, nT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # pos per bh [BH]
            bh3((rep_p, D)),                          # q
            kv3(),                                    # k codes/values
            sc2() if quant else dummy,                # k scales
            kv3(),                                    # v
            sc2() if quant else dummy,                # v scales
        ],
        out_specs=bh3((rep_p, D)),
        out_shape=jax.ShapeDtypeStruct(qr.shape, qr.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh_tile, rep_p, D), jnp.float32),
            pltpu.VMEM((bh_tile, rep_p, 128), jnp.float32),
            pltpu.VMEM((bh_tile, rep_p, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * rep_p * T * D,
            bytes_accessed=2 * BH * T * D * esize + BH * rep_p * D * 4,
            transcendentals=BH * rep_p * T),
        interpret=interpret,
    )(pos_bh, qr, k_cache, k_scale, v_cache, v_scale)
    return out


# dispatch floor: the bh-tiled kernel needs enough (batch*kv-head) rows to
# amortize its grid; below this the B=1 fused kernel / XLA einsum win
_BATCHED_ATTN_MIN_BH = 16
_BATCHED_ATTN = True


def set_batched_attn(on: bool) -> None:
    global _BATCHED_ATTN
    _BATCHED_ATTN = bool(on)


def batched_decode_attention(q, k_cache, v_cache, pos, k_scale=None,
                             v_scale=None):
    """Single-token attention over an ALREADY-UPDATED cache for B > 1.

    q: [B, H, 1, D]; caches: [B, Hkv, T, D] (bf16, or int8/fp8 codes with
    per-(head, token) ``k_scale``/``v_scale`` [B, Hkv, T]); ``pos`` scalar
    or [B]. Returns out [B, H, 1, D] in q.dtype, or None when the shape is
    outside the kernel envelope (callers fall back to the XLA einsum)."""
    B, H, S, D = q.shape
    Hkv, T = k_cache.shape[1], k_cache.shape[2]
    if S != 1 or not _BATCHED_ATTN:
        return None
    BH = B * Hkv
    # B == 1 stays on the fused B=1 path: at rep == 1 the q blocks are
    # (1, D) sublane-1 slivers — measured 423 s compiles and a 176 -> 79
    # tok/s bench collapse when this kernel took llama2 B=1 (round 4)
    if B == 1 or BH < _BATCHED_ATTN_MIN_BH or D % 128 or T % 128:
        return None
    esize = jnp.dtype(k_cache.dtype).itemsize
    bh_tile, Tc = _batched_tiles(BH, T, D, esize)
    if not Tc:
        return None
    interpret = not _on_tpu()
    if interpret and k_cache.dtype not in (jnp.bfloat16, jnp.float32,
                                           jnp.int8):
        return None  # interpreter has no fp8 cast support
    rep = H // Hkv
    rep_p = rep if rep == 1 else -(-rep // 8) * 8
    qr = q[:, :, 0].reshape(B, Hkv, rep, D)
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    qr = qr.reshape(BH, rep_p, D)
    pos_bh = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1, 1), (B, Hkv)).reshape(BH)
    ks = None if k_scale is None else \
        k_scale.reshape(BH, T).astype(jnp.float32)
    vs = None if v_scale is None else \
        v_scale.reshape(BH, T).astype(jnp.float32)
    out = _batched_attn_impl(pos_bh, qr, k_cache.reshape(BH, T, D), ks,
                             v_cache.reshape(BH, T, D), vs, interpret,
                             f8bits=_F8_VIA_BITS)
    out = out.reshape(B, Hkv, rep_p, D)[:, :, :rep]
    return out.reshape(B, H, 1, D)


def decode_attention_tp(q, k_new, v_new, k_cache, v_cache, pos, mesh,
                        axis: str = "model", data_axis: str | None = "data"):
    """Head-sharded fused decode attention under shard_map (pjit cannot
    partition a pallas_call): each shard runs the kernel on its local
    heads; no collective is needed — the output stays head-sharded and the
    row-parallel o_proj consumes it. Set up by
    ``models.sharding.enable_tp_serving``."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    B = q.shape[0]
    pos_arr = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    spec4 = P(data_axis, axis, None, None)

    out, k2, v2 = shard_map(
        lambda q, kn, vn, kc, vc, p: decode_attention(q, kn, vn, kc, vc, p),
        mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec4, spec4, P(data_axis)),
        out_specs=(spec4, spec4, spec4),
        check_vma=False,
    )(q, k_new, v_new, k_cache, v_cache, pos_arr)
    return out, k2, v2


def decode_attention(q, k_new, v_new, k_cache, v_cache, pos):
    """Fused single-token attention with cache update.

    q: [B, H, 1, D]; k_new/v_new: [B, Hkv, 1, D] (rope already applied);
    caches: [B, Hkv, T, D]. ``pos`` is a scalar or a per-batch [B] array
    (per-slot positions for continuous batching).
    Returns (out [B, H, 1, D], k_cache, v_cache).

    Write modes (``set_cache_write_mode``): "outside" (default) runs the
    READ-ONLY kernel and writes the new row with an XLA
    dynamic_update_slice — in-place on the donated loop carry. The
    round-1/2 aliased in-kernel write ("kernel") rewrites the full [T, D]
    cache block to HBM every step AND defeats XLA's loop-carry aliasing
    analysis in the full model: the round-3 B=1 trace shows one full
    8 MB cache copy per layer per step (~0.9 ms/step) plus ~37 us/layer
    kernel time vs the ~18 us read roofline.
    """
    B, H, S, D = q.shape
    assert S == 1, "decode kernel is single-token"
    if _WRITE_MODE == "outside":
        from ..models.llama import _update_rows

        if _RO_CACHE_SPACE == "hbm" and _on_tpu():
            out = _decode_attn_ro_hbm_impl(pos, q[:, :, 0], k_new, v_new,
                                           k_cache, v_cache)
        else:
            out = _decode_attn_ro_impl(pos, q[:, :, 0], k_new, v_new,
                                       k_cache, v_cache,
                                       interpret=not _on_tpu(),
                                       pin=(_RO_CACHE_SPACE == "pin"
                                            and _on_tpu()))
        k2 = _update_rows(k_cache, k_new, pos)
        v2 = _update_rows(v_cache, v_new, pos)
        return out, k2, v2
    k2, v2, out = _decode_attn_impl(
        pos, q[:, :, 0], k_new, v_new, k_cache,
        v_cache, interpret=not _on_tpu())
    return out, k2, v2
