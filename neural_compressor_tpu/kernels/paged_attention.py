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
    # v1 keeps rank-4 [..., None] scales: its per-head squeeze makes a
    # rank-3 block illegal ((1, squeeze, page) sublane block of 1), and
    # v1 exists only as the A/B comparator — the lane-pad copy cost
    # this causes is part of what v2 fixes (see v2 impl note)
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
# v2: all-heads, multi-page blocks. The v1 grid (B, Hkv, PMAX) DMAs one
# [page, D] block per step (32 KB bf16) — latency-bound, and the grid is
# Hkv x larger than it needs to be (B=8 paged decode measured ~2x the
# contiguous einsum). v2 grids over (B, ceil(PMAX/KPP)) and stages KPP
# whole pages across heads per step (KPP scalar-prefetch-mapped views of
# the SAME pool, concatenated along the page axis in VMEM): the score
# dot runs KPP*page lanes per MXU pass and the online softmax processes
# KPP*page columns per chunk, amortizing the per-grid-step fixed cost
# that made the one-page variant ~160 GB/s (profile_paged_b8.log).
# ---------------------------------------------------------------------------

_KPP = 4  # pages staged per grid step (clamped to pmax)


def _paged_kernel_v2(bt_ref, len_ref, q_ref, *args, page, rep_p, gsteps,
                     scale, Hkv, quant, kpp, int4=False, window=None,
                     softcap=None, wq=1, rep=None):
    # NO per-head loop: an in-kernel fori_loop over heads with dynamic
    # scratch indexing measured ~25 us/head (801 us/layer at Hkv=32,
    # profile_paged_b8.log) — the head axis rides dot_general BATCH dims
    # instead, so Mosaic schedules one fused op chain per page group.
    kps = args[0:kpp]
    kss = args[kpp:2 * kpp]
    vps = args[2 * kpp:3 * kpp]
    vss = args[3 * kpp:4 * kpp]
    if int4:  # affine off planes follow (asym per-(token, head, D-half))
        kos = args[4 * kpp:5 * kpp]
        vos = args[5 * kpp:6 * kpp]
        rest = args[6 * kpp:]
    else:
        rest = args[4 * kpp:]
    o_ref = rest[0]
    acc_s, m_s, l_s = rest[1:4]
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)

    w = kpp * page
    length = len_ref[b]
    t_idx = p * w + jax.lax.broadcasted_iota(
        jnp.int32, (Hkv, rep_p, w), 2)
    if wq == 1:
        qpos = length - 1                          # [scalar]
        valid = t_idx < length
    else:
        # WINDOWED queries (speculative verify): rows pack (w, rep) —
        # query row i is window index i // rep at position
        # length - wq + i // rep; causal per row
        w_of = jax.lax.broadcasted_iota(
            jnp.int32, (Hkv, rep_p, w), 1) // rep
        qpos = length - wq + w_of
        valid = t_idx <= qpos
    if window is not None:
        # sliding band (gemma local layers): only keys with
        # q_pos - k_pos < window participate
        valid = valid & (t_idx > qpos - window)

    q = q_ref[0]                                    # [Hkv, rep_p, D]
    if int4:
        # token-half-split bytes [Hkv, page/2, D]: low nibble = token r,
        # high = token r + page/2 (offset-binary, -8 recenters)
        def _unp(r):
            b = r[0].astype(jnp.int32)
            lo = (b & 15) - 8
            hi = (b >> 4) - 8
            return jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)

        k = jnp.concatenate([_unp(r) for r in kps], axis=1) \
            if kpp > 1 else _unp(kps[0])
        v = jnp.concatenate([_unp(r) for r in vps], axis=1) \
            if kpp > 1 else _unp(vps[0])
    elif kpp == 1:
        from .decode_attention import _codes_bf16

        k = _codes_bf16(kps[0][0])                  # [Hkv, w, D]
        v = _codes_bf16(vps[0][0])
    else:
        from .decode_attention import _codes_bf16

        k = jnp.concatenate([_codes_bf16(r[0]) for r in kps], axis=1)
        v = jnp.concatenate([_codes_bf16(r[0]) for r in vps], axis=1)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if quant:
        if kpp == 1:
            ksc = kss[0][0]                         # [Hkv, w]
            vsc = vss[0][0]
        else:
            ksc = jnp.concatenate([r[0] for r in kss], axis=1)
            vsc = jnp.concatenate([r[0] for r in vss], axis=1)
        s = s * ksc[:, None, :]
    if int4:
        # per-token AFFINE int4 (value = s*(c-8)+off): the off term is a
        # rank-1 score correction off[t] * sum(q) — one extra multiply
        # on the score block, no extra MXU pass or VMEM temp
        koc = (kos[0][0] if kpp == 1
               else jnp.concatenate([r[0] for r in kos], axis=1))
        voc = (vos[0][0] if kpp == 1
               else jnp.concatenate([r[0] for r in vos], axis=1))
        qsum = jnp.sum(q.astype(jnp.float32), axis=-1)   # [Hkv, rep_p]
        s = s + qsum[..., None] * koc[:, None, :]
    s = s * scale
    if softcap is not None:
        # gemma-2 logit softcapping, BEFORE the mask (HF order); tanh is
        # monotonic so the online running-max stays correct
        s = softcap * jnp.tanh(s / softcap)
    s = jnp.where(valid, s, -1e30)
    m_old = m_s[:, :, 0:1]                          # [Hkv, rep_p, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=2, keepdims=True))
    # explicit zero: a fully-masked page keeps pexp == 0 even while
    # m_new is still the -1e30 sentinel
    pexp = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_old - m_new)
    l_s[:, :, 0:1] = l_s[:, :, 0:1] * alpha + jnp.sum(pexp, axis=2,
                                                      keepdims=True)
    m_s[:, :, 0:1] = jnp.broadcast_to(m_new, (Hkv, rep_p, 1))
    dgv = (((2,), (1,)), ((0,), (0,)))
    if int4:
        # (pexp . off) broadcasts over D; the scale folds into the probs
        corr = jnp.sum(pexp * voc[:, None, :], axis=2)   # [Hkv, rep_p]
        pv = jax.lax.dot_general(
            (pexp * vsc[:, None, :]).astype(jnp.bfloat16), v, dgv,
            preferred_element_type=jnp.float32)
        pv = pv + corr[..., None]
    else:
        if quant:
            pexp = pexp * vsc[:, None, :]
        pv = jax.lax.dot_general(
            pexp.astype(jnp.bfloat16), v, dgv,
            preferred_element_type=jnp.float32)     # [Hkv, rep_p, D]
    acc_s[:] = acc_s[:] * alpha + pv

    @pl.when(p == gsteps - 1)
    def _():
        o_ref[0] = (acc_s[:] / jnp.maximum(l_s[:, :, 0:1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "window",
                                             "softcap", "f8bits"))
def _paged_attn_impl_v2(q, k_pages, k_scales, v_pages, v_scales,
                        block_tables, lengths, interpret, window=None,
                        softcap=None, f8bits=True, k_offs=None,
                        v_offs=None):
    # ``f8bits`` keys the jit cache for decode_attention.set_f8_via_bits
    B, H, S, D = q.shape
    P, Hkv, page_c, _ = k_pages.shape
    int4 = k_pages.dtype == jnp.uint8
    page = page_c * 2 if int4 else page_c
    pmax = block_tables.shape[1]
    rep = H // Hkv
    wq = S  # windowed queries (speculative verify) when S > 1
    # int4 works for wq > 1 too: the affine corrections are row-generic
    # (padded query rows are zero, so their qsum/corr terms vanish)
    if wq == 1:
        qr = q[:, :, 0].reshape(B, Hkv, rep, D)
    else:
        # rows pack (w, rep): [B, H, W, D] -> [B, Hkv, W*rep, D]
        qr = (q.reshape(B, Hkv, rep, wq, D).transpose(0, 1, 3, 2, 4)
              .reshape(B, Hkv, wq * rep, D))
    rows = wq * rep
    rep_p = max(-(-rows // 8) * 8, 8)
    if rep_p != rows:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rep_p - rows), (0, 0)))
    kpp = min(_KPP, pmax)
    # clamp by VMEM: K+V staged blocks are double-buffered; the scoped
    # vmem limit is 16 MB (bf16 MHA-32 pools OOM'd at kpp=4: 16.38 MB).
    # int4 additionally materializes unpacked AND code-scaled bf16 temps
    # of the full [Hkv, w, D] group for K and V (4 arrays — measured
    # 21.06M stack at kpp=4/B=16, paged_int4_asym_ab.log round 5)
    blk = Hkv * page_c * D * jnp.dtype(k_pages.dtype).itemsize
    while kpp > 1 and 2 * 2 * kpp * blk > 14 * 1024 * 1024:
        kpp //= 2
    gsteps = -(-pmax // kpp)
    pmax_pad = gsteps * kpp
    bt = block_tables.astype(jnp.int32)
    if pmax_pad != pmax:
        # padding pages map to pool page 0; their t_idx >= pmax*page
        # >= every length, so the kernel masks them whole
        bt = jnp.pad(bt, ((0, 0), (0, pmax_pad - pmax)))
    bt = bt.reshape(-1)
    lengths = lengths.astype(jnp.int32)
    quant = k_scales is not None
    if quant:
        # rank-3 [P, Hkv, page] blocks: an [..., None] reshape here
        # pads the lane dim 1 -> 128 (a 136 MB physical buffer at 7B
        # pool shapes) and XLA materializes it per layer per step —
        # 17.5 ms/step of 'copy' at B=8 (profile_paged_b8_post.log).
        # int4 affine planes are [P, Hkv, 2*page]
        ks3 = k_scales.astype(jnp.float32)
        vs3 = v_scales.astype(jnp.float32)
    else:  # dummy [1, Hkv, page] so the spec list is static
        ks3 = jnp.zeros((1, Hkv, page), jnp.float32)
        vs3 = ks3

    def page_map_j(j):
        def page_map(b, p, bt_ref, ln_ref):
            return (bt_ref[b * pmax_pad + p * kpp + j], 0, 0, 0)
        return page_map

    def sc_map_j(j):
        def sc_map(b, p, bt_ref, ln_ref):
            return (bt_ref[b * pmax_pad + p * kpp + j], 0, 0)
        return sc_map

    dummy_sc = lambda b, p, bt, ln: (0, 0, 0)
    pg_specs = [pl.BlockSpec((1, Hkv, page_c, D), page_map_j(j),
                             memory_space=pltpu.VMEM)
                for j in range(kpp)]
    sc_specs = [pl.BlockSpec((1, Hkv, page),
                             sc_map_j(j) if quant else dummy_sc,
                             memory_space=pltpu.VMEM)
                for j in range(kpp)]
    extra_specs = sc_specs if int4 else []      # affine off planes
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, gsteps),
        in_specs=[pl.BlockSpec((1, Hkv, rep_p, D),
                               lambda b, p, bt, ln: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + pg_specs + sc_specs + pg_specs + sc_specs
        + extra_specs + extra_specs,
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
                               gsteps=gsteps, scale=1.0 / (D ** 0.5),
                               Hkv=Hkv, quant=quant, kpp=kpp, int4=int4,
                               window=window, softcap=softcap, wq=wq,
                               rep=rep)
    extra_ops = ((list([k_offs.astype(jnp.float32)] * kpp)
                  + list([v_offs.astype(jnp.float32)] * kpp))
                 if int4 else [])
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(bt, lengths, qr, *([k_pages] * kpp), *([ks3] * kpp),
      *([v_pages] * kpp), *([vs3] * kpp), *extra_ops)
    out = out[:, :, :wq * rep]
    if wq == 1:
        return out.reshape(B, Hkv * rep, 1, D)
    return (out.reshape(B, Hkv, wq, rep, D).transpose(0, 1, 3, 2, 4)
            .reshape(B, Hkv * rep, wq, D))


# ---------------------------------------------------------------------------
# Paged row WRITE kernel. The XLA scatter (`pool.at[pids, :, off].set`)
# copies the whole pool per layer even with unique_indices — 21.5 ms/step
# of 'copy' at B=8 (profile_paged_b8.log), ~50% of the paged step. This
# kernel stages each slot's CURRENT page block, patches the new row with
# a vectorized select, and writes the block back through
# input_output_aliases — guaranteed in-place on the pool. Per step per
# layer: B x [Hkv, page, D] read+write (~2 MB/slot) instead of a pool
# copy.
# ---------------------------------------------------------------------------


def _write_kernel_bf16(pid_ref, off_ref, kn_ref, vn_ref, kp_ref, vp_ref,
                       ko_ref, vo_ref, *, page, Hkv, D):
    b = pl.program_id(0)
    off = off_ref[b]
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page, D), 1)
    ko_ref[0] = jnp.where(row == off, kn_ref[0, :, 0][:, None, :].astype(
        ko_ref.dtype), kp_ref[0])
    vo_ref[0] = jnp.where(row == off, vn_ref[0, :, 0][:, None, :].astype(
        vo_ref.dtype), vp_ref[0])


def _write_kernel_quant(pid_ref, off_ref, kn_ref, vn_ref, kp_ref, ks_ref,
                        vp_ref, vs_ref, ko_ref, kso_ref, vo_ref, vso_ref,
                        *, page, Hkv, D):
    b = pl.program_id(0)
    off = off_ref[b]
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page, D), 1)
    kf = kn_ref[0, :, 0].astype(jnp.float32)              # [Hkv, D]
    vf = vn_ref[0, :, 0].astype(jnp.float32)
    ks = jnp.max(jnp.abs(kf), axis=1, keepdims=True)      # [Hkv, 1]
    vs = jnp.max(jnp.abs(vf), axis=1, keepdims=True)
    ks = jnp.where(ks <= 0, 1.0, ks / 127.0)
    vs = jnp.where(vs <= 0, 1.0, vs / 127.0)
    if ko_ref.dtype == jnp.int8:
        kq = jnp.clip(jnp.round(kf / ks), -128, 127).astype(ko_ref.dtype)
        vq = jnp.clip(jnp.round(vf / vs), -128, 127).astype(vo_ref.dtype)
    else:  # fp8: amax/448 scaling (models.llama._kv_quant)
        ks = ks * (127.0 / 448.0)
        vs = vs * (127.0 / 448.0)
        kq = jnp.clip(kf / ks, -448.0, 448.0).astype(ko_ref.dtype)
        vq = jnp.clip(vf / vs, -448.0, 448.0).astype(vo_ref.dtype)
    ko_ref[0] = jnp.where(row == off, kq[:, None, :], kp_ref[0])
    vo_ref[0] = jnp.where(row == off, vq[:, None, :], vp_ref[0])
    col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page), 1)
    kso_ref[0] = jnp.where(col == off, ks, ks_ref[0])
    vso_ref[0] = jnp.where(col == off, vs, vs_ref[0])


def _write_kernel_int4(pid_ref, off_ref, kn_ref, vn_ref, kp_ref, ks_ref,
                       koff_ref, vp_ref, vs_ref, voff_ref,
                       ko_ref, kso_ref, koffo_ref, vo_ref, vso_ref,
                       voffo_ref, *, page, Hkv, D):
    """int4 pool: pages are token-half-split bytes [Hkv, page/2, D]
    (token r low nibble, token r + page/2 high) — patch one nibble of
    the target byte row, leave the partner token's nibble intact.
    Quantization is ASYMMETRIC per (token, head):
    value ~= s * (nibble - 8) + off, with s/off on [Hkv, page] planes
    (_kv_quant4_asym_codes; see the PagedKVCache docstring)."""
    b = pl.program_id(0)
    off = off_ref[b]
    half = page // 2
    brow = off % half
    hi = off >= half

    def one(n_ref, p_ref, s_ref, of_ref, o_ref, so_ref, ofo_ref):
        f = n_ref[0, :, 0].astype(jnp.float32)           # [Hkv, D]
        mn = jnp.min(f, axis=1, keepdims=True)           # [Hkv, 1]
        mx = jnp.max(f, axis=1, keepdims=True)
        sc = jnp.where(mx - mn <= 0, 1.0, (mx - mn) / 15.0)
        c = jnp.clip(jnp.round((f - mn) / sc), 0, 15).astype(jnp.int32)
        ofv = mn + 8.0 * sc
        old = p_ref[0].astype(jnp.int32)                 # [Hkv, half, D]
        merged = jnp.where(hi, (old & 0x0F) | (c[:, None, :] << 4),
                           (old & 0xF0) | c[:, None, :])
        row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, half, D), 1)
        o_ref[0] = jnp.where(row == brow, merged, old).astype(jnp.uint8)
        col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page), 1)
        so_ref[0] = jnp.where(col == off, sc, s_ref[0])
        ofo_ref[0] = jnp.where(col == off, ofv, of_ref[0])

    one(kn_ref, kp_ref, ks_ref, koff_ref, ko_ref, kso_ref, koffo_ref)
    one(vn_ref, vp_ref, vs_ref, voff_ref, vo_ref, vso_ref, voffo_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_write_impl(pids, off, k_new, v_new, k_pages, k_scales, v_pages,
                      v_scales, interpret, k_offs=None, v_offs=None):
    P, Hkv, page_c, D = k_pages.shape
    B = pids.shape[0]
    quant = k_scales is not None
    int4 = k_pages.dtype == jnp.uint8
    page = page_c * 2 if int4 else page_c

    def page_map(b, pid_ref, off_ref):
        return (pid_ref[b], 0, 0, 0)

    def sc_map(b, pid_ref, off_ref):
        return (pid_ref[b], 0, 0)

    new_spec = pl.BlockSpec((1, Hkv, 1, D), lambda b, p, o: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    pg_spec = pl.BlockSpec((1, Hkv, page_c, D), page_map,
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, Hkv, page), sc_map,
                           memory_space=pltpu.VMEM)
    if quant and int4:
        kernel = functools.partial(_write_kernel_int4, page=page, Hkv=Hkv,
                                   D=D)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B,),
                in_specs=[new_spec, new_spec, pg_spec, sc_spec, sc_spec,
                          pg_spec, sc_spec, sc_spec],
                out_specs=[pg_spec, sc_spec, sc_spec, pg_spec, sc_spec,
                           sc_spec]),
            out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                       jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
                       jax.ShapeDtypeStruct(k_offs.shape, jnp.float32),
                       jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
                       jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
                       jax.ShapeDtypeStruct(v_offs.shape, jnp.float32)],
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(pids, off, k_new, v_new, k_pages, k_scales.astype(jnp.float32),
          k_offs.astype(jnp.float32), v_pages,
          v_scales.astype(jnp.float32), v_offs.astype(jnp.float32))
        return out
    if quant:
        kernel = functools.partial(_write_kernel_quant, page=page, Hkv=Hkv,
                                   D=D)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B,),
                in_specs=[new_spec, new_spec, pg_spec, sc_spec, pg_spec,
                          sc_spec],
                out_specs=[pg_spec, sc_spec, pg_spec, sc_spec]),
            out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                       jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
                       jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
                       jax.ShapeDtypeStruct(v_scales.shape, jnp.float32)],
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(pids, off, k_new, v_new, k_pages, k_scales.astype(jnp.float32),
          v_pages, v_scales.astype(jnp.float32))
        return out[0], out[1], out[2], out[3]
    kernel = functools.partial(_write_kernel_bf16, page=page, Hkv=Hkv, D=D)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[new_spec, new_spec, pg_spec, pg_spec],
            out_specs=[pg_spec, pg_spec]),
        out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)],
        # alias indices count the scalar-prefetch operands too
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pids, off, k_new, v_new, k_pages, v_pages)
    return out[0], None, out[1], None


def paged_write_rows(cache, k_new, v_new, pos):
    """In-place (aliased) write of the new K/V rows into their pages;
    returns the updated PagedKVCache. ``pos`` scalar or [B]. Falls back
    to None off-envelope (callers use the XLA scatter path)."""
    B = k_new.shape[0]
    P, Hkv, _pc, D = cache.k_pages.shape
    page = cache.page_size  # logical tokens/page (2x byte rows for int4)
    if D % 128 or page % 128 or Hkv % 8:
        return None
    interpret = not _on_tpu()
    if interpret and cache.k_pages.dtype not in (jnp.bfloat16, jnp.float32,
                                                 jnp.int8, jnp.uint8):
        return None
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    pids = jnp.take_along_axis(cache.block_tables,
                               (pos // page)[:, None], axis=1)[:, 0]
    off = (pos % page).astype(jnp.int32)
    if cache.k_pages.dtype == jnp.uint8:
        kp, ks, koff, vp, vs, voff = _paged_write_impl(
            pids.astype(jnp.int32), off, k_new, v_new, cache.k_pages,
            cache.k_scales, cache.v_pages, cache.v_scales, interpret,
            k_offs=cache.k_offs, v_offs=cache.v_offs)
        return cache._replace(k_pages=kp, v_pages=vp, k_scales=ks,
                              v_scales=vs, k_offs=koff, v_offs=voff)
    kp, ks, vp, vs = _paged_write_impl(
        pids.astype(jnp.int32), off, k_new, v_new, cache.k_pages,
        cache.k_scales, cache.v_pages, cache.v_scales, interpret)
    return cache._replace(k_pages=kp, v_pages=vp,
                          k_scales=ks if ks is not None else cache.k_scales,
                          v_scales=vs if vs is not None else cache.v_scales)


# ---------------------------------------------------------------------------
# WINDOWED paged row write (speculative serving): W consecutive rows per
# slot, possibly spanning one page boundary — both candidate pages are
# staged, every window row is patched with a masked select against its
# block-local offset (rows that fall outside a block simply never match
# its iota), and both blocks write back aliased. Slots whose window fits
# one page pass the TRASH page as the second block: its rows never
# match, so the unchanged block writes back harmlessly.
# ---------------------------------------------------------------------------


def _write_kernel_bf16_w(pid2_ref, off_ref, kn_ref, vn_ref, kp_ref,
                         vp_ref, ko_ref, vo_ref, *, page, Hkv, D, W):
    b = pl.program_id(0)
    blk = pl.program_id(1)               # 0: window's first page, 1: next
    base = off_ref[b]                    # pos % page of the first row
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page, D), 1)
    ko = kp_ref[0]
    vo = vp_ref[0]
    for w in range(W):
        tgt = base + w - blk * page      # outside [0, page): no match
        ko = jnp.where(row == tgt,
                       kn_ref[0, :, w][:, None, :].astype(ko.dtype), ko)
        vo = jnp.where(row == tgt,
                       vn_ref[0, :, w][:, None, :].astype(vo.dtype), vo)
    ko_ref[0] = ko
    vo_ref[0] = vo


def _write_kernel_quant_w(pid2_ref, off_ref, kn_ref, vn_ref, kp_ref,
                          ks_ref, vp_ref, vs_ref, ko_ref, kso_ref,
                          vo_ref, vso_ref, *, page, Hkv, D, W):
    b = pl.program_id(0)
    blk = pl.program_id(1)
    base = off_ref[b]
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page, D), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page), 1)
    fp8 = ko_ref.dtype != jnp.int8

    def qrow(f):                          # [Hkv, D] -> codes, scale
        amax = jnp.max(jnp.abs(f), axis=1, keepdims=True)
        if fp8:
            sc = jnp.where(amax <= 0, 1.0, amax / 448.0)
            cq = jnp.clip(f / sc, -448.0, 448.0)
        else:
            sc = jnp.where(amax <= 0, 1.0, amax / 127.0)
            cq = jnp.clip(jnp.round(f / sc), -128, 127)
        return cq, sc

    ko = kp_ref[0]
    vo = vp_ref[0]
    kso = ks_ref[0]
    vso = vs_ref[0]
    for w in range(W):
        tgt = base + w - blk * page
        kq, ksc = qrow(kn_ref[0, :, w].astype(jnp.float32))
        vq, vsc = qrow(vn_ref[0, :, w].astype(jnp.float32))
        ko = jnp.where(row == tgt, kq.astype(ko.dtype)[:, None, :], ko)
        vo = jnp.where(row == tgt, vq.astype(vo.dtype)[:, None, :], vo)
        kso = jnp.where(col == tgt, ksc, kso)
        vso = jnp.where(col == tgt, vsc, vso)
    ko_ref[0] = ko
    vo_ref[0] = vo
    kso_ref[0] = kso
    vso_ref[0] = vso


def _write_kernel_int4_w(pid2_ref, off_ref, kn_ref, vn_ref, kp_ref,
                         ks_ref, koff_ref, vp_ref, vs_ref, voff_ref,
                         ko_ref, kso_ref, koffo_ref, vo_ref, vso_ref,
                         voffo_ref, *, page, Hkv, D, W):
    """Windowed variant of ``_write_kernel_int4``: patch W consecutive
    tokens' nibbles into the staged token-half-split byte block.
    Window rows outside this block (tgt not in [0, page)) match no byte
    row and no plane column, so the block writes back unchanged for
    them — the same coverage rule as the bf16/quant windowed kernels."""
    b = pl.program_id(0)
    blk = pl.program_id(1)
    base = off_ref[b]
    half = page // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, half, D), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page), 1)

    def one(n_ref, p_ref, s_ref, of_ref, o_ref, so_ref, ofo_ref):
        o = p_ref[0].astype(jnp.int32)                # [Hkv, half, D]
        so = s_ref[0]
        ofo = of_ref[0]
        for w in range(W):
            tgt = base + w - blk * page
            valid = (tgt >= 0) & (tgt < page)
            tgtc = jnp.clip(tgt, 0, page - 1)
            brow = jnp.where(valid, tgtc % half, -1)
            hi = tgtc >= half
            f = n_ref[0, :, w].astype(jnp.float32)    # [Hkv, D]
            mn = jnp.min(f, axis=1, keepdims=True)
            mx = jnp.max(f, axis=1, keepdims=True)
            sc = jnp.where(mx - mn <= 0, 1.0, (mx - mn) / 15.0)
            c = jnp.clip(jnp.round((f - mn) / sc), 0, 15).astype(jnp.int32)
            ofv = mn + 8.0 * sc
            merged = jnp.where(hi, (o & 0x0F) | (c[:, None, :] << 4),
                               (o & 0xF0) | c[:, None, :])
            o = jnp.where(row == brow, merged, o)
            tcol = jnp.where(valid, tgt, -1)
            so = jnp.where(col == tcol, sc, so)
            ofo = jnp.where(col == tcol, ofv, ofo)
        o_ref[0] = o.astype(jnp.uint8)
        so_ref[0] = so
        ofo_ref[0] = ofo

    one(kn_ref, kp_ref, ks_ref, koff_ref, ko_ref, kso_ref, koffo_ref)
    one(vn_ref, vp_ref, vs_ref, voff_ref, vo_ref, vso_ref, voffo_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_write_window_impl(pids2, off, k_new, v_new, k_pages,
                             k_scales, v_pages, v_scales, interpret,
                             k_offs=None, v_offs=None):
    """``pids2`` [2B] = the window's first page id and its successor per
    slot, interleaved (grid (B, 2) — one staged page block per grid
    step; non-crossing windows pass the trash page as block 1, which
    writes back unchanged)."""
    P, Hkv, page_c, D = k_pages.shape
    B = k_new.shape[0]
    W = k_new.shape[2]
    quant = k_scales is not None
    int4 = k_pages.dtype == jnp.uint8
    page = page_c * 2 if int4 else page_c

    def page_map(b, j, pid2_ref, off_ref):
        return (pid2_ref[b * 2 + j], 0, 0, 0)

    def sc_map(b, j, pid2_ref, off_ref):
        return (pid2_ref[b * 2 + j], 0, 0)

    new_spec = pl.BlockSpec((1, Hkv, W, D),
                            lambda b, j, p2, o: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    pg_spec = pl.BlockSpec((1, Hkv, page_c, D), page_map,
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, Hkv, page), sc_map,
                           memory_space=pltpu.VMEM)
    if quant and int4:
        kernel = functools.partial(_write_kernel_int4_w, page=page,
                                   Hkv=Hkv, D=D, W=W)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, 2),
                in_specs=[new_spec, new_spec, pg_spec, sc_spec, sc_spec,
                          pg_spec, sc_spec, sc_spec],
                out_specs=[pg_spec, sc_spec, sc_spec, pg_spec, sc_spec,
                           sc_spec]),
            out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                       jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
                       jax.ShapeDtypeStruct(k_offs.shape, jnp.float32),
                       jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
                       jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
                       jax.ShapeDtypeStruct(v_offs.shape, jnp.float32)],
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(pids2, off, k_new, v_new, k_pages,
          k_scales.astype(jnp.float32), k_offs.astype(jnp.float32),
          v_pages, v_scales.astype(jnp.float32),
          v_offs.astype(jnp.float32))
        return out
    if quant:
        kernel = functools.partial(_write_kernel_quant_w, page=page,
                                   Hkv=Hkv, D=D, W=W)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, 2),
                in_specs=[new_spec, new_spec, pg_spec, sc_spec, pg_spec,
                          sc_spec],
                out_specs=[pg_spec, sc_spec, pg_spec, sc_spec]),
            out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                       jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
                       jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
                       jax.ShapeDtypeStruct(v_scales.shape, jnp.float32)],
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(pids2, off, k_new, v_new, k_pages,
          k_scales.astype(jnp.float32), v_pages,
          v_scales.astype(jnp.float32))
        return out
    kernel = functools.partial(_write_kernel_bf16_w, page=page, Hkv=Hkv,
                               D=D, W=W)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, 2),
            in_specs=[new_spec, new_spec, pg_spec, pg_spec],
            out_specs=[pg_spec, pg_spec]),
        out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(pids2, off, k_new, v_new, k_pages, v_pages)
    return out[0], None, out[1], None


def paged_write_window(cache, k_new, v_new, pos):
    """W consecutive rows per slot into the pages ([B, Hkv, W, D] at
    per-slot start ``pos`` [B]); bf16/int8/fp8 AND int4 pools.
    The window may span one page boundary (W <= page_size)."""
    B, Hkv_, W, D = k_new.shape
    page = cache.page_size
    if W > page:
        return None
    if D % 128 or page % 128 or Hkv_ % 8:
        return None
    interpret = not _on_tpu()
    if interpret and cache.k_pages.dtype not in (jnp.bfloat16, jnp.float32,
                                                 jnp.int8, jnp.uint8):
        return None
    pmax = cache.block_tables.shape[1]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    p0 = jnp.clip(pos // page, 0, pmax - 1)
    bt = cache.block_tables.astype(jnp.int32)
    pid0 = jnp.take_along_axis(bt, p0[:, None], axis=1)[:, 0]
    p1 = jnp.clip(p0 + 1, 0, pmax - 1)
    pid1 = jnp.take_along_axis(bt, p1[:, None], axis=1)[:, 0]
    # block 1 goes to TRASH when the window doesn't cross a boundary OR
    # there is no successor page (overshoot rows past the table belong
    # to positions >= the slot's budget — no accepted query ever attends
    # them, so dropping their KV is safe by the coverage rule)
    crosses = ((pos % page) + W > page) & (p0 + 1 <= pmax - 1)
    pid1 = jnp.where(crosses, pid1, 0)
    pids2 = jnp.stack([pid0, pid1], axis=1).reshape(-1).astype(jnp.int32)
    off = (pos % page).astype(jnp.int32)
    if cache.k_pages.dtype == jnp.uint8:
        kp, ks, koff, vp, vs, voff = _paged_write_window_impl(
            pids2, off, k_new, v_new, cache.k_pages, cache.k_scales,
            cache.v_pages, cache.v_scales, interpret,
            k_offs=cache.k_offs, v_offs=cache.v_offs)
        return cache._replace(k_pages=kp, v_pages=vp, k_scales=ks,
                              v_scales=vs, k_offs=koff, v_offs=voff)
    kp, ks, vp, vs = _paged_write_window_impl(
        pids2, off, k_new, v_new, cache.k_pages, cache.k_scales,
        cache.v_pages, cache.v_scales, interpret)
    return cache._replace(k_pages=kp, v_pages=vp,
                          k_scales=ks if ks is not None else cache.k_scales,
                          v_scales=vs if vs is not None else cache.v_scales)


# v2 (all-heads page blocks) is the default; v1 kept for A/B
_PAGED_V2 = True


def set_paged_v2(on: bool) -> None:
    global _PAGED_V2
    _PAGED_V2 = bool(on)


def paged_window_attention(q, cache, lengths):
    """W-query windowed attention over a ``PagedKVCache`` (speculative
    verify): q [B, H, W, D]; ``lengths`` [B] = the per-slot token count
    INCLUDING the whole window (window row w sits at position
    lengths - W + w and attends causally). v2 kernel only; all pool
    formats incl. int4 affine. Returns [B, H, W, D]."""
    from .decode_attention import _F8_VIA_BITS

    out = _paged_attn_impl_v2(q, cache.k_pages, cache.k_scales,
                              cache.v_pages, cache.v_scales,
                              cache.block_tables, lengths,
                              not _on_tpu(), f8bits=_F8_VIA_BITS,
                              k_offs=getattr(cache, "k_offs", None),
                              v_offs=getattr(cache, "v_offs", None))
    return out * (lengths > 0)[:, None, None, None].astype(out.dtype)


def paged_decode_attention(q, cache, lengths, window=None, softcap=None):
    """Single-token attention over a ``PagedKVCache`` (models.llama).

    q: [B, H, 1, D]; ``lengths`` [B] = tokens already in the cache
    INCLUDING the current one (the new row must be written before the
    call). Slots with length 0 return zeros (their first masked page
    would otherwise average arbitrary pool data through the online
    softmax: every exp(s - m_init) = 1 when all scores are -1e30).
    ``window``/``softcap`` (static): gemma sliding-band masking and
    logit softcapping — v2-kernel only. Returns out [B, H, 1, D].
    """
    assert q.shape[2] == 1, "paged decode attention is single-token"
    interpret = not _on_tpu()
    if _PAGED_V2 or cache.k_pages.dtype == jnp.uint8:  # v1 has no int4
        from .decode_attention import _F8_VIA_BITS

        out = _paged_attn_impl_v2(q, cache.k_pages, cache.k_scales,
                                  cache.v_pages, cache.v_scales,
                                  cache.block_tables, lengths, interpret,
                                  window=window, softcap=softcap,
                                  f8bits=_F8_VIA_BITS,
                                  k_offs=getattr(cache, "k_offs", None),
                                  v_offs=getattr(cache, "v_offs", None))
    elif window is not None or softcap is not None:
        raise NotImplementedError(
            "window/softcap need the v2 paged kernel (set_paged_v2)")
    elif cache.k_scales is None:
        out = _paged_attn_impl(q, cache.k_pages, cache.v_pages,
                               cache.block_tables, lengths, interpret)
    else:
        out = _paged_attn_quant_impl(q, cache.k_pages, cache.k_scales,
                                     cache.v_pages, cache.v_scales,
                                     cache.block_tables, lengths, interpret)
    return out * (lengths > 0)[:, None, None, None].astype(out.dtype)


# ---------------------------------------------------------------------------
# MLA latent paging (deepseek). The latent cache is ONE [r+dr]-wide row
# per token, head-count independent (models/deepseek.LatentKVCache), so
# its paged form is simpler than llama's: pages [P, 1, page, C], no head
# batching — the score dot is a single [H, C] x [C, kpp*page] MXU pass
# per page group and the online softmax carries [H]-row state. Combines
# the 71x latent compression with allocator elasticity. The reference
# has no MLA paging at all (vLLM delegation, helper_modules.py:1178).
# ---------------------------------------------------------------------------


def _latent_write_kernel(pid_ref, off_ref, new_ref, p_ref, o_ref, *,
                         page, C):
    b = pl.program_id(0)
    off = off_ref[b]
    row = jax.lax.broadcasted_iota(jnp.int32, (page, C), 0)
    o_ref[0, 0] = jnp.where(row == off, new_ref[0, 0].astype(o_ref.dtype),
                            p_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_latent_write_impl(pids, off, new_row, pages, interpret):
    P, _one, page, C = pages.shape
    B = pids.shape[0]
    out = pl.pallas_call(
        functools.partial(_latent_write_kernel, page=page, C=C),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1, 1, C), lambda b, p, o: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, page, C),
                             lambda b, p_ref, o_ref: (p_ref[b], 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, page, C),
                lambda b, p_ref, o_ref: (p_ref[b], 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        # alias indices count the scalar-prefetch operands
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pids, off, new_row, pages)
    return out


def paged_write_latent(lat_pages, block_tables, row, pos):
    """Aliased in-place write of one latent row per slot. ``row``
    [B, C]; ``pos`` scalar or [B]. Returns the updated pages, or None
    off-envelope (callers scatter instead)."""
    P, _one, page, C = lat_pages.shape
    B = row.shape[0]
    if page % 8:
        return None
    interpret = not _on_tpu()
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    pids = jnp.take_along_axis(block_tables.astype(jnp.int32),
                               (pos // page)[:, None], axis=1)[:, 0]
    off = (pos % page).astype(jnp.int32)
    return _paged_latent_write_impl(pids, off,
                                    row.reshape(B, 1, 1, C), lat_pages,
                                    interpret)


def _paged_latent_kernel(bt_ref, len_ref, q_ref, *args, page, Hp, gsteps,
                         r, scale, kpp):
    lats = args[0:kpp]
    o_ref = args[kpp]
    acc_s, m_s, l_s = args[kpp + 1:kpp + 4]
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)

    w = kpp * page
    length = len_ref[b]
    t_idx = p * w + jax.lax.broadcasted_iota(jnp.int32, (Hp, w), 1)
    valid = t_idx < length

    q = q_ref[0]                                    # [Hp, C]
    if kpp == 1:
        lat = lats[0][0, 0]                         # [w, C]
    else:
        lat = jnp.concatenate([x[0, 0] for x in lats], axis=0)
    s = jax.lax.dot_general(q, lat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    s = jnp.where(valid, s, -1e30)
    m_old = m_s[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    pexp = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_old - m_new)
    l_s[:, 0:1] = l_s[:, 0:1] * alpha + jnp.sum(pexp, axis=1,
                                                keepdims=True)
    m_s[:, 0:1] = m_new
    pv = jax.lax.dot_general(
        pexp.astype(lat.dtype), lat[:, :r],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [Hp, r]
    acc_s[:] = acc_s[:] * alpha + pv

    @pl.when(p == gsteps - 1)
    def _():
        o_ref[0] = (acc_s[:] / jnp.maximum(l_s[:, 0:1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "r", "scale"))
def _paged_latent_attn_impl(qcat, lat_pages, block_tables, lengths,
                            scale, r, interpret):
    B, H, C = qcat.shape
    P, _one, page, _ = lat_pages.shape
    pmax = block_tables.shape[1]
    Hp = -(-H // 8) * 8
    if Hp != H:
        qcat = jnp.pad(qcat, ((0, 0), (0, Hp - H), (0, 0)))
    esize = jnp.dtype(lat_pages.dtype).itemsize
    kpp = min(_KPP, pmax)
    while kpp > 1 and 2 * kpp * page * C * esize > 14 * 1024 * 1024:
        kpp //= 2
    gsteps = -(-pmax // kpp)
    pmax_pad = gsteps * kpp
    bt = block_tables.astype(jnp.int32)
    if pmax_pad != pmax:
        bt = jnp.pad(bt, ((0, 0), (0, pmax_pad - pmax)))
    bt = bt.reshape(-1)
    lengths = lengths.astype(jnp.int32)

    def page_map_j(j):
        def page_map(b, p, bt_ref, ln_ref):
            return (bt_ref[b * pmax_pad + p * kpp + j], 0, 0, 0)
        return page_map

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, gsteps),
        in_specs=[pl.BlockSpec((1, Hp, C),
                               lambda b, p, bt_, ln: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, 1, page, C), page_map_j(j),
                        memory_space=pltpu.VMEM) for j in range(kpp)],
        out_specs=pl.BlockSpec((1, Hp, r),
                               lambda b, p, bt_, ln: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hp, r), jnp.float32),
            pltpu.VMEM((Hp, 128), jnp.float32),
            pltpu.VMEM((Hp, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_latent_kernel, page=page, Hp=Hp,
                               gsteps=gsteps, r=r, scale=scale, kpp=kpp)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(bt, lengths, qcat, *([lat_pages] * kpp))
    return out[:, :H]


def paged_latent_attention(qcat, lat_pages, block_tables, lengths, r,
                           scale):
    """Decode attention over a paged MLA latent cache.

    qcat [B, H, 1, C] (absorbed query | rotated q), pages
    [P, 1, page, C], ``lengths`` [B] incl. the current token (write the
    row first). Returns o_lat [B, H, 1, r] f32 (the probs-latent dot;
    the caller applies the value absorb factor). Zero-length slots
    return zeros."""
    assert qcat.shape[2] == 1, "paged latent attention is single-token"
    out = _paged_latent_attn_impl(
        qcat[:, :, 0], lat_pages, block_tables,
        jnp.asarray(lengths, jnp.int32), float(scale), int(r),
        not _on_tpu())
    out = out * (jnp.asarray(lengths) > 0)[:, None, None].astype(out.dtype)
    return out[:, :, None]
