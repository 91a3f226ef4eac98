"""Paged decode attention: KV pages + block tables (vLLM-style), TPU-native.

The reference's long-context story is KV-cache quantization inside vLLM's
paged allocator (PatchedVLLMKVCache, helper_modules.py:1178-1240) — the
paging itself lives in vLLM. Here both halves are native: a page pool
[n_pages, Hkv, page_size, D] (bf16 or int8 codes + per-row scales), per-
slot block tables, and a Pallas kernel that walks a slot's pages with
scalar-prefetch-driven index maps (the block table entry SELECTS the page
block DMA'd for each grid step) and an online-softmax accumulator.

Grid: (B, Hkv, PMAX). The page axis is sequential ("arbitrary"); running
max / normalizer / weighted-V accumulators live in VMEM scratch. Pages at
or beyond a slot's length are masked whole (their block-table entries may
point anywhere valid).
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


def _paged_kernel(bt_ref, len_ref, q_ref, kp_ref, vp_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, page, rep, pmax, scale, quant):
    b = pl.program_id(0)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = len_ref[b]
    base = p * page
    q = q_ref[0]                         # [rep, D]
    if quant:
        k = kp_ref[0].astype(jnp.bfloat16)   # codes [page, D]
        v = vp_ref[0].astype(jnp.bfloat16)
    else:
        k = kp_ref[0]
        v = vp_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [rep, page]
    s = s * scale
    t_idx = base + jax.lax.broadcasted_iota(jnp.int32, (rep, page), 1)
    s = jnp.where(t_idx < length, s, -1e30)

    # online softmax across pages
    m_prev = m_ref[:, 0:1]                          # [rep, 1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    pexp = jnp.exp(s - m_cur)                       # [rep, page]
    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(pexp, axis=1,
                                                    keepdims=True)
    m_ref[:, 0:1] = m_cur
    pv = jax.lax.dot_general(pexp.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [rep, D]
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(p == pmax - 1)
    def _():
        o_ref[0] = (acc_ref[:] /
                    jnp.maximum(l_ref[:, 0:1], 1e-30)).astype(o_ref.dtype)


def _paged_quant_kernel(bt_ref, len_ref, q_ref, kp_ref, ks_ref, vp_ref,
                        vs_ref, o_ref, acc_ref, m_ref, l_ref,
                        *, page, rep, pmax, scale):
    """int8/fp8 page pool variant: per-row scales fold into scores/probs."""
    b = pl.program_id(0)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = len_ref[b]
    base = p * page
    q = q_ref[0]
    k = kp_ref[0].astype(jnp.bfloat16)
    v = vp_ref[0].astype(jnp.bfloat16)
    ksc = ks_ref[0][:, 0]                # [page]
    vsc = vs_ref[0][:, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (ksc * scale)[None, :]
    t_idx = base + jax.lax.broadcasted_iota(jnp.int32, (rep, page), 1)
    s = jnp.where(t_idx < length, s, -1e30)

    m_prev = m_ref[:, 0:1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    pexp = jnp.exp(s - m_cur)
    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(pexp, axis=1,
                                                    keepdims=True)
    m_ref[:, 0:1] = m_cur
    pw = pexp * vsc[None, :]
    pv = jax.lax.dot_general(pw.astype(jnp.bfloat16), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(p == pmax - 1)
    def _():
        o_ref[0] = (acc_ref[:] /
                    jnp.maximum(l_ref[:, 0:1], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret",))
def _paged_attn_impl(q, k_pages, v_pages, block_tables, lengths, interpret):
    B, H, S, D = q.shape
    P, Hkv, page, _ = k_pages.shape
    pmax = block_tables.shape[1]
    rep = H // Hkv
    qr = q[:, :, 0].reshape(B, Hkv, rep, D)
    rep_p = max(rep, 8)  # 8-sublane query block (rep=1 blocks misbehave)
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    scale = 1.0 / (D ** 0.5)
    bt = block_tables.reshape(-1).astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)

    def page_map(b, h, p, bt_ref, len_ref):
        return (bt_ref[b * pmax + p], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, pmax),
        in_specs=[
            pl.BlockSpec((1, None, rep_p, D),
                         lambda b, h, p, bt, ln: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, None, page, D), page_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, None, page, D), page_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, None, rep_p, D),
                               lambda b, h, p, bt, ln: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rep_p, D), jnp.float32),
            pltpu.VMEM((rep_p, 128), jnp.float32),
            pltpu.VMEM((rep_p, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_kernel, page=page, rep=rep_p,
                               pmax=pmax, scale=scale,
                               quant=k_pages.dtype != q.dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(bt, lengths, qr, k_pages, v_pages)
    if rep_p != rep:
        out = out[:, :, :rep]
    return out.reshape(B, Hkv * rep, 1, D)


@functools.partial(
    jax.jit, static_argnames=("interpret",))
def _paged_attn_quant_impl(q, k_pages, k_scales, v_pages, v_scales,
                           block_tables, lengths, interpret):
    B, H, S, D = q.shape
    P, Hkv, page, _ = k_pages.shape
    pmax = block_tables.shape[1]
    rep = H // Hkv
    qr = q[:, :, 0].reshape(B, Hkv, rep, D)
    rep_p = max(rep, 8)  # 8-sublane query block (rep=1 blocks misbehave)
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    scale = 1.0 / (D ** 0.5)
    bt = block_tables.reshape(-1).astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)
    ks4 = k_scales[..., None].astype(jnp.float32)  # [P, Hkv, page, 1]
    vs4 = v_scales[..., None].astype(jnp.float32)

    def page_map(b, h, p, bt_ref, ln_ref):
        return (bt_ref[b * pmax + p], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, pmax),
        in_specs=[
            pl.BlockSpec((1, None, rep_p, D),
                         lambda b, h, p, bt, ln: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, None, page, D), page_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, None, page, 1), page_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, None, page, D), page_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, None, page, 1), page_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, None, rep_p, D),
                               lambda b, h, p, bt, ln: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rep_p, D), jnp.float32),
            pltpu.VMEM((rep_p, 128), jnp.float32),
            pltpu.VMEM((rep_p, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_quant_kernel, page=page, rep=rep_p,
                               pmax=pmax, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(bt, lengths, qr, k_pages, ks4, v_pages, vs4)
    if rep_p != rep:
        out = out[:, :, :rep]
    return out.reshape(B, Hkv * rep, 1, D)


# ---------------------------------------------------------------------------
# v2: all-heads page blocks. The v1 grid (B, Hkv, PMAX) DMAs one
# [page, D] block per step (32 KB bf16) — latency-bound, and the grid is
# Hkv x larger than it needs to be (B=8 paged decode measured ~2x the
# contiguous einsum). v2 grids over (B, PMAX) and stages a WHOLE page
# across heads per step ([Hkv, page, D]: 1 MB for MHA-32, 256 KB for
# GQA-8), looping heads inside with per-head online-softmax scratch
# (dynamic indexing on the untiled leading scratch dim).
# ---------------------------------------------------------------------------


def _paged_kernel_v2(bt_ref, len_ref, q_ref, kp_ref, ks_ref, vp_ref,
                     vs_ref, o_ref, acc_s, m_s, l_s, *, page, rep_p, pmax,
                     scale, Hkv, quant):
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)

    length = len_ref[b]
    t_idx = p * page + jax.lax.broadcasted_iota(jnp.int32, (rep_p, page), 1)
    valid = t_idx < length

    def head(h, _):
        q = q_ref[0, h]                                  # [rep_p, D]
        k = kp_ref[0, h].astype(jnp.bfloat16)            # [page, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            s = s * ks_ref[0, h, :, 0][None, :]
        s = s * scale
        s = jnp.where(valid, s, -1e30)
        m_old = m_s[h, :, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        # explicit zero: a fully-masked page keeps pexp == 0 even while
        # m_new is still the -1e30 sentinel
        pexp = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_old - m_new)
        l_s[h, :, 0:1] = l_s[h, :, 0:1] * alpha + jnp.sum(
            pexp, axis=1, keepdims=True)
        m_s[h, :, 0:1] = m_new
        if quant:
            pexp = pexp * vs_ref[0, h, :, 0][None, :]
        pv = jax.lax.dot_general(
            pexp.astype(jnp.bfloat16), vp_ref[0, h].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_s[h] = acc_s[h] * alpha + pv
        return 0

    jax.lax.fori_loop(0, Hkv, head, 0)

    @pl.when(p == pmax - 1)
    def _():
        def emit(h, _):
            o_ref[0, h] = (acc_s[h] / jnp.maximum(l_s[h, :, 0:1], 1e-30)
                           ).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, Hkv, emit, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_attn_impl_v2(q, k_pages, k_scales, v_pages, v_scales,
                        block_tables, lengths, interpret):
    B, H, S, D = q.shape
    P, Hkv, page, _ = k_pages.shape
    pmax = block_tables.shape[1]
    rep = H // Hkv
    qr = q[:, :, 0].reshape(B, Hkv, rep, D)
    rep_p = max(rep, 8)
    if rep_p != rep:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rep), (0, 0)))
    bt = block_tables.reshape(-1).astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)
    quant = k_scales is not None
    if quant:
        ks4 = k_scales[..., None].astype(jnp.float32)
        vs4 = v_scales[..., None].astype(jnp.float32)
    else:  # dummy [P, Hkv, page, 1] so the spec list is static
        ks4 = jnp.zeros((1, Hkv, page, 1), jnp.float32)
        vs4 = ks4

    def page_map(b, p, bt_ref, ln_ref):
        return (bt_ref[b * pmax + p], 0, 0, 0)

    dummy_map = lambda b, p, bt, ln: (0, 0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, pmax),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep_p, D),
                         lambda b, p, bt, ln: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, page, D), page_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, page, 1),
                         page_map if quant else dummy_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, page, D), page_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, page, 1),
                         page_map if quant else dummy_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hkv, rep_p, D),
                               lambda b, p, bt, ln: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hkv, rep_p, D), jnp.float32),
            pltpu.VMEM((Hkv, rep_p, 128), jnp.float32),
            pltpu.VMEM((Hkv, rep_p, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_kernel_v2, page=page, rep_p=rep_p,
                               pmax=pmax, scale=1.0 / (D ** 0.5), Hkv=Hkv,
                               quant=quant)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(bt, lengths, qr, k_pages, ks4, v_pages, vs4)
    if rep_p != rep:
        out = out[:, :, :rep]
    return out.reshape(B, Hkv * rep, 1, D)


# v2 (all-heads page blocks) is the default; v1 kept for A/B
_PAGED_V2 = True


def set_paged_v2(on: bool) -> None:
    global _PAGED_V2
    _PAGED_V2 = bool(on)


def paged_decode_attention(q, cache, lengths):
    """Single-token attention over a ``PagedKVCache`` (models.llama).

    q: [B, H, 1, D]; ``lengths`` [B] = tokens already in the cache
    INCLUDING the current one (the new row must be written before the
    call). Slots with length 0 return zeros (their first masked page
    would otherwise average arbitrary pool data through the online
    softmax: every exp(s - m_init) = 1 when all scores are -1e30).
    Returns out [B, H, 1, D].
    """
    assert q.shape[2] == 1, "paged decode attention is single-token"
    interpret = not _on_tpu()
    if _PAGED_V2:
        out = _paged_attn_impl_v2(q, cache.k_pages, cache.k_scales,
                                  cache.v_pages, cache.v_scales,
                                  cache.block_tables, lengths, interpret)
    elif cache.k_scales is None:
        out = _paged_attn_impl(q, cache.k_pages, cache.v_pages,
                               cache.block_tables, lengths, interpret)
    else:
        out = _paged_attn_quant_impl(q, cache.k_pages, cache.k_scales,
                                     cache.v_pages, cache.v_scales,
                                     cache.block_tables, lengths, interpret)
    return out * (lengths > 0)[:, None, None, None].astype(out.dtype)
