"""Llama-family causal LM, written TPU-first in NNX.

Covers Llama-2/3 and Mistral-style architectures (GQA, RoPE, SwiGLU,
RMSNorm) — the flagship model family of the reference's LLM recipes
(docs/source/llm_recipes.md). All Linears are plain ``nnx.Linear`` so the
quantization passes swap them directly; attention supports an optional
static-shape KV cache for jit-compiled decode.

Design notes (TPU):
  * static shapes everywhere; decode uses a fixed-size cache + position
    index with ``lax.dynamic_update_slice``
  * attention via ``jnp.einsum`` on [B, H, S, D] — XLA maps these to MXU
  * params created in bf16 by default (MXU native), f32 accumulation
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int | None = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    # qwen2-style attention: biases on q/k/v projections only
    attention_bias: bool = False
    # GLM-style rotary: "half" = HF llama rotate-half over the full head
    # dim; "interleaved_partial" = GLM/chatglm rotate-every-two over the
    # first partial_rotary_factor * head_dim dims, rest pass-through
    rope_style: str = "half"
    partial_rotary_factor: float = 1.0
    # Phi-3 "longrope" (su-rope): per-dim frequency rescale factors plus a
    # global attention factor sqrt(1 + ln(s)/ln(orig_max)). The short/long
    # choice is static (max_position_embeddings vs the original training
    # context), matching HF's trace-time resolution — no data-dependent
    # branching inside jit. ``rope_scaling`` holds {"type": "longrope",
    # "short_factor": [...], "long_factor": [...],
    # "original_max_position_embeddings": N}.
    rope_scaling: dict | None = None
    dtype: object = jnp.bfloat16

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads


LLAMA_PRESETS = {
    # tiny config for tests
    "llama-test": dict(vocab_size=256, hidden_size=128, intermediate_size=256,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=128),
    "llama2-7b": dict(hidden_size=4096, intermediate_size=11008,
                      num_hidden_layers=32, num_attention_heads=32,
                      num_key_value_heads=32),
    "llama2-13b": dict(hidden_size=5120, intermediate_size=13824,
                       num_hidden_layers=40, num_attention_heads=40,
                       num_key_value_heads=40),
    "llama3-8b": dict(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=8,
                      rope_theta=500000.0, max_position_embeddings=8192),
    "mistral-7b": dict(hidden_size=4096, intermediate_size=14336,
                       num_hidden_layers=32, num_attention_heads=32,
                       num_key_value_heads=8, rope_theta=10000.0),
    "qwen2-7b": dict(vocab_size=152064, hidden_size=3584,
                     intermediate_size=18944, num_hidden_layers=28,
                     num_attention_heads=28, num_key_value_heads=4,
                     rope_theta=1e6, attention_bias=True),
    "qwen2-test": dict(vocab_size=256, hidden_size=128,
                       intermediate_size=256, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128, attention_bias=True),
    # GLM family (chatglm lineage in its HF-native "glm" form): GQA with
    # 2 kv heads, qkv biases, partial interleaved rotary, fused gate_up
    # in the checkpoint (split to gate/up on import, re-fused for serving)
    "glm-4-9b": dict(vocab_size=151552, hidden_size=4096,
                     intermediate_size=13696, num_hidden_layers=40,
                     num_attention_heads=32, num_key_value_heads=2,
                     head_dim=128, rms_norm_eps=1.5625e-7,
                     rope_theta=10000.0, attention_bias=True,
                     rope_style="interleaved_partial",
                     partial_rotary_factor=0.5),
    # Phi-3 (microsoft/Phi-3-mini): llama graph with fused qkv/gate_up in
    # the checkpoint (split on import) and longrope scaling on the 128k
    # variant (reference recipe family llm_recipes.md phi rows)
    "phi3-mini-4k": dict(vocab_size=32064, hidden_size=3072,
                         intermediate_size=8192, num_hidden_layers=32,
                         num_attention_heads=32, num_key_value_heads=32,
                         max_position_embeddings=4096, rope_theta=10000.0),
    # Phi-4-mini: phi3 layout with GQA (24q/8kv), 0.75 partial rotary,
    # 200k vocab, tied embeddings
    "phi4-mini": dict(vocab_size=200064, hidden_size=3072,
                      intermediate_size=8192, num_hidden_layers=32,
                      num_attention_heads=24, num_key_value_heads=8,
                      max_position_embeddings=4096, rope_theta=10000.0,
                      partial_rotary_factor=0.75,
                      tie_word_embeddings=True),
    "phi3-test": dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      rope_scaling=dict(
                          type="longrope",
                          original_max_position_embeddings=32,
                          short_factor=[1.0] * 8,
                          long_factor=[1.5] * 8)),
    "glm-test": dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=16,
                     max_position_embeddings=128, attention_bias=True,
                     rope_style="interleaved_partial",
                     partial_rotary_factor=0.5),
}


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache.

    Layout: k/v are [B, H_kv, S_max, D] — head-major so the decode
    attention einsums contract without relayout (a [B, S, H, D] cache costs
    ~33 MB of transposes per layer per step at 7B scale)."""

    k: jax.Array
    v: jax.Array


class QuantKVCache(NamedTuple):
    """Quantized KV cache with per-(token, head) scales — the TPU-native
    analog of the reference's ``PatchedKVCache``/``PatchedVLLMKVCache``
    (fp8_quant/_quant_common/helper_modules.py:1105-1240). Codes are int8
    or fp8-e4m3 (the format is carried by the codes' dtype); both halve KV
    HBM traffic vs bf16. Scales are [B, H, S] f32 (negligible overhead).

    int4 (packed nibble pairs, half-split along D) is ASYMMETRIC per
    (token, head, D-half): ``x ~= scale * (nibble - 8) + off`` with
    ``scale``/``off`` [B, H, S, 2] f32. Symmetric per-token int4 cost
    +0.15 ppl on GQA (over the <=0.1 budget); the per-half affine form
    measured 3-5x lower error across the architecture battery at ~3%
    more cache bytes (experiments/kv_int4_variants.py, round 5) and its
    offset terms fold into the half-split score/output dots."""

    k_codes: jax.Array  # int8 | float8_e4m3fn [B,H,S,D] | uint8 [B,H,S,D/2]
    k_scale: jax.Array  # f32  [B, H, S]  (int4: [B, H, S, 2])
    v_codes: jax.Array
    v_scale: jax.Array
    k_off: jax.Array | None = None   # f32 [B, H, S, 2] (int4 only)
    v_off: jax.Array | None = None

    @property
    def fmt(self) -> str:
        if self.k_codes.dtype == jnp.int8:
            return "int8"
        if self.k_codes.dtype == jnp.uint8:
            return "int4"  # packed nibble pairs (half-split along D)
        return "fp8_e4m3"


class PagedKVCache(NamedTuple):
    """Paged KV cache (vLLM-style block allocator, TPU-native): a shared
    page pool + per-slot block tables. Pages are [page_size, D] rows per
    KV head; the pool may hold bf16 rows or int8/fp8 codes with per-row
    scales (reference PatchedVLLMKVCache, helper_modules.py:1178-1240 —
    there the paging lives in vLLM; here it is native, consumed by
    ``kernels.paged_attention``)."""

    k_pages: jax.Array             # [P, Hkv, page, D] bf16 | int8 | fp8
    k_scales: jax.Array | None     # [P, Hkv, page] f32 (quantized pools)
    v_pages: jax.Array
    v_scales: jax.Array | None
    block_tables: jax.Array        # [B, PMAX] int32 page ids per slot
    # int4 pools are ASYMMETRIC per (token, head): value ~= scale *
    # (nibble - 8) + off. Per-token (not per-D-half like the contiguous
    # cache) because the off fold is a rank-1 score correction at zero
    # extra MXU/VMEM cost, whereas per-half forms measured 2x MXU or
    # scoped-vmem OOM in the paged kernel (paged_int4_asym_ab.log);
    # decode-measured Δppl +0.076 on tiny_gqa — inside the 0.1 budget
    # (the old symmetric form was +0.15).
    k_offs: jax.Array | None = None  # [P, Hkv, page] f32 (int4 only)
    v_offs: jax.Array | None = None

    @property
    def page_size(self) -> int:
        s = self.k_pages.shape[2]
        # int4 pools store token-half-split bytes: 2 tokens per byte row
        return s * 2 if self.k_pages.dtype == jnp.uint8 else s


def init_paged_pool(cfg: "LlamaConfig", n_pages: int, batch: int,
                    max_len: int, page_size: int = 128, dtype=None,
                    quantized: bool | str = False):
    """Per-layer ``PagedKVCache`` pools with empty block tables."""
    dtype = dtype or cfg.dtype
    pmax = (max_len + page_size - 1) // page_size
    shape = (n_pages, cfg.num_key_value_heads, page_size, cfg.head_dim)
    sshape = shape[:-1]
    out = []
    for _ in range(cfg.num_hidden_layers):
        # per-layer copy: buffer donation cannot alias one block-table
        # array into several pytree leaves
        bt = jnp.zeros((batch, pmax), jnp.int32)
        if quantized:
            fmt = "int8" if quantized is True else str(quantized)
            if fmt == "int4":
                # token-half-split packing: byte row r of a page holds
                # token r in the low nibble and token r + page/2 in the
                # high — [P, Hkv, page/2, D] uint8 keeps the lane dim at
                # D (no physical padding), unlike the contiguous cache's
                # D-half-split ([..., T, D/2] would pad lanes D/2->128).
                # per-(token, head) affine params (see PagedKVCache)
                assert page_size % 16 == 0, "int4 pages need page%16==0"
                cshape = (n_pages, cfg.num_key_value_heads,
                          page_size // 2, cfg.head_dim)
                out.append(PagedKVCache(jnp.zeros(cshape, jnp.uint8),
                                        jnp.ones(sshape, jnp.float32),
                                        jnp.zeros(cshape, jnp.uint8),
                                        jnp.ones(sshape, jnp.float32),
                                        bt,
                                        jnp.zeros(sshape, jnp.float32),
                                        jnp.zeros(sshape, jnp.float32)))
                continue
            cdt = _KV_CODE_DTYPES[fmt]
            out.append(PagedKVCache(jnp.zeros(shape, cdt),
                                    jnp.ones(sshape, jnp.float32),
                                    jnp.zeros(shape, cdt),
                                    jnp.ones(sshape, jnp.float32), bt))
        else:
            out.append(PagedKVCache(jnp.zeros(shape, dtype), None,
                                    jnp.zeros(shape, dtype), None, bt))
    return out


def _paged_write_row(cache: PagedKVCache, k_new, v_new, pos):
    """Write the new K/V rows [B, Hkv, 1, D] into their pages at
    per-slot ``pos`` [B] (page id from the block table).

    On TPU this is a pallas kernel with aliased outputs (stage the
    slot's page block, patch the row, write back in place) — the XLA
    scatter fallback below copies the whole pool per layer even with
    unique indices (21.5 ms/step at B=8, profile_paged_b8.log)."""
    from ..kernels.paged_attention import paged_write_rows

    out = paged_write_rows(cache, k_new, v_new, pos)
    if out is not None:
        return out
    page = cache.page_size
    pos = jnp.asarray(pos, jnp.int32).reshape(-1)
    pids = jnp.take_along_axis(cache.block_tables,
                               (pos // page)[:, None], axis=1)[:, 0]  # [B]
    off = pos % page
    # unique_indices: every slot owns DISTINCT pages (the allocator never
    # maps one page to two slots), which lets XLA use the in-place
    # scatter path — without it the conservative scatter copied the whole
    # pool per layer (21.5 ms/step of 'copy' at B=8,
    # experiments/profile_paged_b8.log). The one sanctioned duplicate is
    # the shared TRASH page (idle engine slots all park on page 0):
    # duplicate-write results are unspecified, which is fine for a page
    # whose rows are never attended (masked by per-slot length).
    upd = lambda arr, val: arr.at[pids, :, off].set(  # noqa: E731
        val, unique_indices=True)
    if cache.k_pages.dtype == jnp.uint8:  # int4 token-half-split pages
        half = page // 2
        brow = off % half
        hi = (off >= half)[:, None, None]            # [B, 1, 1]
        kc4, ks, koff = _kv_quant4_asym_codes(k_new)
        vc4, vs, voff = _kv_quant4_asym_codes(v_new)

        def patch(pool, c4):
            old = pool[pids, :, brow]                # [B, Hkv, D]
            c = c4[:, :, 0]
            new = jnp.where(hi, (old & 0x0F) | (c << 4),
                            (old & 0xF0) | c)
            return pool.at[pids, :, brow].set(new.astype(jnp.uint8),
                                              unique_indices=True)

        return cache._replace(
            k_pages=patch(cache.k_pages, kc4),
            k_scales=upd(cache.k_scales, ks[:, :, 0]),
            v_pages=patch(cache.v_pages, vc4),
            v_scales=upd(cache.v_scales, vs[:, :, 0]),
            k_offs=upd(cache.k_offs, koff[:, :, 0]),
            v_offs=upd(cache.v_offs, voff[:, :, 0]))
    if cache.k_scales is not None:
        fmt = "int8" if cache.k_pages.dtype == jnp.int8 else "fp8_e4m3"
        kc, ks = _kv_quant(k_new, fmt=fmt)
        vc, vs = _kv_quant(v_new, fmt=fmt)
        return cache._replace(
            k_pages=upd(cache.k_pages, kc[:, :, 0]),
            k_scales=upd(cache.k_scales, ks[:, :, 0]),
            v_pages=upd(cache.v_pages, vc[:, :, 0]),
            v_scales=upd(cache.v_scales, vs[:, :, 0]))
    return cache._replace(
        k_pages=upd(cache.k_pages, k_new[:, :, 0].astype(
            cache.k_pages.dtype)),
        v_pages=upd(cache.v_pages, v_new[:, :, 0].astype(
            cache.v_pages.dtype)))


_KV_CODE_DTYPES = {"int8": jnp.int8, "fp8_e4m3": jnp.float8_e4m3fn,
                   "int4": jnp.uint8}


def _kv_quant(x: jax.Array, fmt: str = "int8"):
    """[B, H, S, D] -> codes + per-(token, head) scale.

    Formats: int8 / fp8-e4m3 (codes at element width) and int4 — two
    offset-binary nibbles per uint8 byte, packed HALF-SPLIT along D
    (d < D/2 in the low nibble, d >= D/2 in the high) so the unpack is a
    shift/mask + concat with no interleave relayout. int4 halves KV HBM
    bytes again over int8 — the batched-decode ceiling is cache-read
    bound (PERF_NOTES), so byte width is throughput."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    if fmt == "fp8_e4m3":
        scale = jnp.where(amax <= 0, 1.0, amax / 448.0)
        codes = jnp.clip(xf / scale[..., None], -448.0, 448.0
                         ).astype(jnp.float8_e4m3fn)
    elif fmt == "int4":
        scale = jnp.where(amax <= 0, 1.0, amax / 7.0)
        c = jnp.clip(jnp.round(xf / scale[..., None]), -8, 7) + 8.0
        c = c.astype(jnp.uint8)
        h = c.shape[-1] // 2
        codes = c[..., :h] | (c[..., h:] << 4)
    else:
        scale = jnp.where(amax <= 0, 1.0, amax / 127.0)
        codes = jnp.clip(jnp.round(xf / scale[..., None]), -128, 127
                         ).astype(jnp.int8)
    return codes, scale


def _kv_quant4_asym(x: jax.Array):
    """[B, H, S, D] -> packed D-half-split nibbles + per-(token, head,
    D-half) AFFINE params: ``x ~= scale * (nibble - 8) + off``.

    Asymmetric per-half quantization cuts int4-KV Δppl 3-5x vs the
    symmetric per-token form (tiny_gqa +0.15 -> well under the 0.1
    budget; experiments/kv_int4_variants.py). The unpack keeps the same
    ``nibble - 8`` recentring as the symmetric layout, so ``off``
    absorbs both the distribution minimum and the +8 bias."""
    xf = x.astype(jnp.float32)
    B, H, S, D = xf.shape
    g = xf.reshape(B, H, S, 2, D // 2)
    mn = jnp.min(g, axis=-1)
    mx = jnp.max(g, axis=-1)
    scale = jnp.where(mx - mn <= 0, 1.0, (mx - mn) / 15.0)   # [B,H,S,2]
    c = jnp.clip(jnp.round((g - mn[..., None]) / scale[..., None]),
                 0, 15).astype(jnp.uint8)
    codes = c[..., 0, :] | (c[..., 1, :] << 4)               # [B,H,S,D/2]
    off = mn + 8.0 * scale
    return codes, scale, off


def _kv_dequant4_asym(codes, scale, off, dtype):
    """Inverse of ``_kv_quant4_asym``: packed [.., S, D/2] -> [.., S, D]."""
    c = _kv_unpack_int4(codes).astype(jnp.float32)           # [.., S, D]
    h = c.shape[-1] // 2
    lo = c[..., :h] * scale[..., 0:1] + off[..., 0:1]
    hi = c[..., h:] * scale[..., 1:2] + off[..., 1:2]
    return jnp.concatenate([lo, hi], axis=-1).astype(dtype)


def _kv_quant4_asym_codes(x: jax.Array):
    """[B, H, S, D] -> UNPACKED 0..15 codes (uint8) + per-(token, head)
    affine (scale, off) [B, H, S] — the paged-pool quantizer (pages pack
    two TOKENS per byte; D stays unpacked). value ~= scale*(code-8)+off.
    Per-token (not per-D-half like the contiguous ``_kv_quant4_asym``):
    see the PagedKVCache docstring for the measured trade."""
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    scale = jnp.where(mx - mn <= 0, 1.0, (mx - mn) / 15.0)
    c = jnp.clip(jnp.round((xf - mn[..., None]) / scale[..., None]),
                 0, 15).astype(jnp.uint8)
    return c, scale, mn + 8.0 * scale


def _kv_pack_page_int4(c4: jax.Array) -> jax.Array:
    """Offset-binary codes [..., page, D] -> token-half-split bytes
    [..., page/2, D] (token r low nibble, token r + page/2 high)."""
    half = c4.shape[-2] // 2
    return c4[..., :half, :] | (c4[..., half:, :] << 4)


def _kv_unpack_int4(codes: jax.Array) -> jax.Array:
    """Packed uint8 [.., D/2] -> centered int8 codes [.., D]."""
    lo = (codes & 15).astype(jnp.int8) - 8
    hi = (codes >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-1)


def _kv_codes_int8(codes: jax.Array) -> jax.Array:
    """Cache codes -> dot-ready form (unpacks int4; int8/fp8 pass through)."""
    return _kv_unpack_int4(codes) if codes.dtype == jnp.uint8 else codes


def _kv_dequant(codes: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    codes = _kv_codes_int8(codes)
    return (codes.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _update_rows(cache_arr, new, cache_pos):
    """Write ``new`` [B, H, S, ...] into ``cache_arr`` [B, H, T, ...] at the
    token axis. ``cache_pos`` scalar, or per-batch [B] (continuous
    batching — vmapped per-row update)."""
    new = new.astype(cache_arr.dtype)
    if getattr(cache_pos, "ndim", 0) == 0 or isinstance(cache_pos, int):
        start = (0, 0, cache_pos) + (0,) * (cache_arr.ndim - 3)
        return jax.lax.dynamic_update_slice(cache_arr, new, start)
    def row(c, n, p):
        start = (0, p) + (0,) * (c.ndim - 2)
        return jax.lax.dynamic_update_slice(c, n, start)
    return jax.vmap(row)(cache_arr, new, cache_pos)


class _ChunkedCausal(NamedTuple):
    """Causal-mask SENTINEL for long prefill: carries query positions
    instead of a materialized [B, 1, S, T] bool mask (1 GB at 32k) —
    attention goes through ``_grouped_attention_chunked``, which never
    holds more than one (q-chunk x kv-chunk) score block. Created by
    ``LlamaModel.__call__`` when S*T exceeds ``_DENSE_MASK_ELEMS``."""

    q_pos: jax.Array        # [B or 1, S] position of each query row
    window: int | None = None  # sliding-window size (gemma local layers)


_DENSE_MASK_ELEMS = 16 * 1024 * 1024  # ~4096^2; S*T above this chunks


def set_dense_mask_limit(n: int) -> None:
    global _DENSE_MASK_ELEMS
    _DENSE_MASK_ELEMS = int(n)


def _densify(mask, T: int):
    """Sentinel -> dense bool mask (paths without a chunked variant:
    int4-packed prefill, fp8 SDPA — documented O(S*T) memory)."""
    if isinstance(mask, _ChunkedCausal):
        key_pos = jnp.arange(T)[None, None, None, :]
        qp = mask.q_pos[:, None, :, None]
        m = key_pos <= qp
        if mask.window is not None:
            m &= qp - key_pos < mask.window
        return m
    return mask


def _grouped_attention_chunked(q, k, v, q_pos, D, k_scale=None,
                               v_scale=None, q_chunk=512, kv_chunk=1024,
                               softcap=None, window=None,
                               k_off=None, v_off=None,
                               packed_int4=False, fp8_probs=False):
    """``_grouped_attention`` without the [S, T] score materialization:
    lax.map over query chunks, lax.scan over KV chunks with an
    online-softmax carry — peak extra memory is one
    [B, Hkv, rep, q_chunk, kv_chunk] f32 block (67 MB at MHA-32
    defaults) regardless of S and T. Same causal semantics as the dense
    mask: key index t is visible to a query at position p iff t <= p.
    ``v`` may be narrower than ``k`` (MLA's probs-latent dot consumes
    only the first r columns) — the output takes v's width."""
    B, H, S, _ = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    # packed int4 chunks dequantize to full width inside the scan step
    Dv = D if packed_int4 else v.shape[-1]
    rep = H // Hkv
    qc = min(q_chunk, S)
    tc = min(kv_chunk, T)
    Sp = -(-S // qc) * qc
    Tp = -(-T // tc) * tc
    qg = q.reshape(B, Hkv, rep, S, D)
    if Sp != S:
        qg = jnp.pad(qg, ((0, 0),) * 3 + ((0, Sp - S), (0, 0)))
    q_pos = jnp.broadcast_to(jnp.asarray(q_pos, jnp.int32), (B, S))
    # padded queries get position -1: no key is <= -1, l stays 0 and the
    # 1e-30 guard keeps the (sliced-away) rows finite
    q_pos = jnp.pad(q_pos, ((0, 0), (0, Sp - S)), constant_values=-1)
    pad_t = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
    kp = jnp.pad(k, pad_t) if Tp != T else k
    vp = jnp.pad(v, pad_t) if Tp != T else v
    nt = Tp // tc
    def _pad_s(a):  # scale/off arrays: [B, Hkv, T] or [B, Hkv, T, 2]
        pad = ((0, 0), (0, 0), (0, Tp - T)) + ((0, 0),) * (a.ndim - 3)
        return jnp.pad(a, pad)

    ks = None if k_scale is None else _pad_s(k_scale)
    vs = None if v_scale is None else _pad_s(v_scale)
    Dk = k.shape[-1]  # D, or D/2 packed bytes
    kx = jnp.moveaxis(kp.reshape(B, Hkv, nt, tc, Dk), 2, 0)
    vx = jnp.moveaxis(vp.reshape(B, Hkv, nt, tc, v.shape[-1]), 2, 0)

    def _chunk_s(a):
        tail = a.shape[3:]
        return jnp.moveaxis(a.reshape((B, Hkv, nt, tc) + tail), 2, 0)

    ksx = (jnp.zeros((nt, 1, 1, 1), jnp.float32) if ks is None
           else _chunk_s(ks))
    vsx = (jnp.zeros((nt, 1, 1, 1), jnp.float32) if vs is None
           else _chunk_s(vs))
    koffx = (jnp.zeros((nt, 1, 1, 1), jnp.float32) if k_off is None
             else _chunk_s(_pad_s(k_off)))
    voffx = (jnp.zeros((nt, 1, 1, 1), jnp.float32) if v_off is None
             else _chunk_s(_pad_s(v_off)))
    tpos = jnp.arange(Tp).reshape(nt, tc)
    rsqrt_d = 1.0 / float(D) ** 0.5

    def one_qchunk(args):
        qcb, qpos_c = args                       # [B,Hkv,rep,qc,D], [B,qc]

        def step(carry, xs):
            m, l, acc = carry
            kcb, vcb, kscb, vscb, koffb, voffb, kposb = xs
            if packed_int4:
                # per-chunk dequant of the packed affine codes: one
                # [B, Hkv, tc, D] block (q's dtype) lives at a time; the
                # dequant is ~rep*q_chunk cheaper than the dots it feeds
                kcb = _kv_dequant4_asym(kcb, kscb, koffb, qcb.dtype)
                vcb = _kv_dequant4_asym(vcb, vscb, voffb, qcb.dtype)
            s = jnp.einsum("bgrsd,bgtd->bgrst", qcb, kcb,
                           preferred_element_type=jnp.float32)
            if k_scale is not None and not packed_int4:
                s = s * kscb[:, :, None, None, :]
            s = s * rsqrt_d
            if softcap is not None:  # gemma logit softcapping, pre-mask
                s = softcap * jnp.tanh(s / softcap)
            valid = kposb[None, None, :] <= qpos_c[:, :, None]
            if window is not None:   # gemma sliding band
                valid &= qpos_c[:, :, None] - kposb[None, None, :] < window
            valid = valid[:, None, None]         # [B,1,1,qc,tc]
            s = jnp.where(valid, s, -1e30)
            m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            pexp = jnp.where(valid, jnp.exp(s - m2), 0.0)
            if fp8_probs:
                # fp8_softmax semantics (models.sdpa.fp8_softmax_qdq):
                # QDQ through e4m3 with the fixed 1/448 scale. The
                # chunked form rounds the UNNORMALIZED pexp (also in
                # [0, 1]) — tolerance-level vs the dense order, which
                # normalizes first
                pexp = jnp.clip(pexp * 448.0, 0.0, 448.0).astype(
                    jnp.float8_e4m3fn).astype(jnp.float32) / 448.0
            alpha = jnp.exp(m - m2)
            l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
            if v_scale is not None and not packed_int4:
                pexp = pexp * vscb[:, :, None, None, :]
            pv = jnp.einsum("bgrst,bgtd->bgrsd", pexp.astype(vcb.dtype),
                            vcb, preferred_element_type=jnp.float32)
            return (m2, l2, acc * alpha[..., 0, None] + pv), None

        shape5 = (B, Hkv, rep, qcb.shape[3], 1)
        init = (jnp.full(shape5, -1e30, jnp.float32),
                jnp.zeros(shape5, jnp.float32),
                jnp.zeros(qcb.shape[:-1] + (Dv,), jnp.float32))
        (m, l, acc), _ = jax.lax.scan(step, init,
                                      (kx, vx, ksx, vsx, koffx, voffx,
                                       tpos))
        return acc / jnp.maximum(l[..., 0, None], 1e-30)

    ns = Sp // qc
    qx = jnp.moveaxis(qg.reshape(B, Hkv, rep, ns, qc, D), 3, 0)
    qpx = jnp.moveaxis(q_pos.reshape(B, ns, qc), 1, 0)
    out = jax.lax.map(one_qchunk, (qx, qpx))     # [ns, B, Hkv, rep, qc, Dv]
    out = jnp.moveaxis(out, 0, 3).reshape(B, Hkv, rep, Sp, Dv)[:, :, :, :S]
    return out.reshape(B, H, S, Dv).astype(q.dtype)


def _grouped_attention(q, k, v, mask, D, k_scale=None, v_scale=None):
    """GQA-grouped SDPA: q [B, H, S, D] against k/v [B, Hkv, T, D] without
    materializing repeated K/V (``jnp.repeat`` copies rep x cache bytes —
    at GQA rep=4 that quadruples decode attention HBM traffic). The rep
    query heads of each KV head ride the lhs free dims of one dot.

    ``k_scale``/``v_scale`` [B, Hkv, T]: optional per-(token, head) cache
    scales (QuantKVCache) folded into scores/probs so k/v can be the raw
    codes — same folding as the fused decode kernel (_kernel_q_ro).
    Returns out [B, H, S, D]."""
    if isinstance(mask, _ChunkedCausal):  # long prefill: never hold S x T
        return _grouped_attention_chunked(q, k, v, mask.q_pos, D,
                                          k_scale, v_scale,
                                          window=mask.window)
    B, H, S, _ = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    rep = H // Hkv
    qg = q.reshape(B, Hkv, rep, S, D)
    s = jnp.einsum("bgrsd,bgtd->bgrst", qg, k,
                   preferred_element_type=jnp.float32)
    if k_scale is not None:
        s = s * k_scale[:, :, None, None, :]
    s = s / jnp.sqrt(D).astype(jnp.float32)
    s = jnp.where(mask[:, :, None], s, -1e30)  # [B, 1, 1, S, T] broadcast
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * v_scale[:, :, None, None, :]
    out = jnp.einsum("bgrst,bgtd->bgrsd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, H, S, D).astype(q.dtype)


def _grouped_attention_int4(q, k_packed, v_packed, mask, D,
                            k_scale, v_scale, k_off=None, v_off=None,
                            k_channel_scale=None):
    """``_grouped_attention`` on PACKED int4 caches without materializing
    an unpacked [B, Hkv, T, D] temp: the half-split nibble layout turns
    QK^T into the sum of two half-D dots and PV into two half-D output
    slices, so each dot's rhs is a per-element shift/mask of the packed
    bytes — elementwise, fusable into the dot read — and the cache
    streams from HBM at nibble width.

    Scales are AFFINE per (token, head, D-half) ([B, Hkv, T, 2] — see
    ``_kv_quant4_asym``): ``k_d = ks_h * c_d + koff_h``, so the score
    adds ``koff_h * sum(q over half h)`` — one rank-1 [S]x[T] outer per
    half, negligible vs the [D/2]-deep code dots — and the output adds
    ``(p @ voff_h)`` broadcast over the half's channels."""
    B, H, S, _ = q.shape
    Hkv, T = k_packed.shape[1], k_packed.shape[2]
    if isinstance(mask, _ChunkedCausal):
        # long prefill on a packed int4 cache: per-chunk dequant inside
        # the online-softmax scan (round-5 VERDICT #8 — this path used
        # to densify to an O(S*T) mask). Calibrated per-channel K scales
        # fold into q exactly as in the dense path below
        if k_channel_scale is not None:
            Hkv_ = k_packed.shape[1]
            qc = q.reshape(B, Hkv_, H // Hkv_, S, D)
            qc = qc * k_channel_scale[None, :, None, None, :].astype(
                qc.dtype)
            q = qc.reshape(B, H, S, D)
        return _grouped_attention_chunked(
            q, k_packed, v_packed, mask.q_pos, D, k_scale, v_scale,
            window=mask.window, k_off=k_off, v_off=v_off,
            packed_int4=True)
    mask = _densify(mask, T)
    rep = H // Hkv
    h = D // 2
    qg = q.reshape(B, Hkv, rep, S, D)
    if k_channel_scale is not None:
        # calibrated per-channel K scales fold into q (q·(s_d·c_d) =
        # (q·s)·c); the per-token k_scale rows are 1 in this mode
        qg = qg * k_channel_scale[None, :, None, None, :].astype(qg.dtype)
    dt = q.dtype
    k_lo = ((k_packed & 15).astype(jnp.int8) - 8).astype(dt)
    k_hi = ((k_packed >> 4).astype(jnp.int8) - 8).astype(dt)
    s_lo = jnp.einsum("bgrsd,bgtd->bgrst", qg[..., :h], k_lo,
                      preferred_element_type=jnp.float32)
    s_hi = jnp.einsum("bgrsd,bgtd->bgrst", qg[..., h:], k_hi,
                      preferred_element_type=jnp.float32)
    sc = lambda a, i: a[..., i][:, :, None, None, :]  # noqa: E731
    s = s_lo * sc(k_scale, 0) + s_hi * sc(k_scale, 1)
    if k_off is not None:
        qs_lo = jnp.sum(qg[..., :h].astype(jnp.float32), axis=-1)
        qs_hi = jnp.sum(qg[..., h:].astype(jnp.float32), axis=-1)
        s = (s + qs_lo[..., None] * sc(k_off, 0)
             + qs_hi[..., None] * sc(k_off, 1))
    s = s / jnp.sqrt(D).astype(jnp.float32)
    s = jnp.where(mask[:, :, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    v_lo = ((v_packed & 15).astype(jnp.int8) - 8).astype(dt)
    v_hi = ((v_packed >> 4).astype(jnp.int8) - 8).astype(dt)
    o_lo = jnp.einsum("bgrst,bgtd->bgrsd", (p * sc(v_scale, 0)).astype(dt),
                      v_lo, preferred_element_type=jnp.float32)
    o_hi = jnp.einsum("bgrst,bgtd->bgrsd", (p * sc(v_scale, 1)).astype(dt),
                      v_hi, preferred_element_type=jnp.float32)
    if v_off is not None:
        o_lo = o_lo + jnp.einsum("bgrst,bgt->bgrs", p,
                                 v_off[..., 0])[..., None]
        o_hi = o_hi + jnp.einsum("bgrst,bgt->bgrs", p,
                                 v_off[..., 1])[..., None]
    out = jnp.concatenate([o_lo, o_hi], axis=-1)
    return out.reshape(B, H, S, D).astype(q.dtype)


def update_cache(cache, k, v, cache_pos, dtype):
    """Write new K/V rows [B, H, S, D] into a ``KVCache`` or ``QuantKVCache``
    (quantizing per token-head) and return ``(k_all, v_all, new_cache)``
    with k_all/v_all dequantized to ``dtype``. Shared by every model family
    in the zoo; the llama attention additionally has fused decode kernels."""
    if isinstance(cache, QuantKVCache):
        if cache.fmt == "int4":
            kc, ks, koff = _kv_quant4_asym(k)
            vc, vs, voff = _kv_quant4_asym(v)
            new = QuantKVCache(
                _update_rows(cache.k_codes, kc, cache_pos),
                _update_rows(cache.k_scale, ks, cache_pos),
                _update_rows(cache.v_codes, vc, cache_pos),
                _update_rows(cache.v_scale, vs, cache_pos),
                _update_rows(cache.k_off, koff, cache_pos),
                _update_rows(cache.v_off, voff, cache_pos))
            return (_kv_dequant4_asym(new.k_codes, new.k_scale, new.k_off,
                                      dtype),
                    _kv_dequant4_asym(new.v_codes, new.v_scale, new.v_off,
                                      dtype), new)
        kc, ks = _kv_quant(k, fmt=cache.fmt)
        vc, vs = _kv_quant(v, fmt=cache.fmt)
        new = QuantKVCache(
            _update_rows(cache.k_codes, kc, cache_pos),
            _update_rows(cache.k_scale, ks, cache_pos),
            _update_rows(cache.v_codes, vc, cache_pos),
            _update_rows(cache.v_scale, vs, cache_pos))
        return (_kv_dequant(new.k_codes, new.k_scale, dtype),
                _kv_dequant(new.v_codes, new.v_scale, dtype), new)
    k_all = _update_rows(cache.k, k, cache_pos)
    v_all = _update_rows(cache.v, v, cache_pos)
    return k_all.astype(dtype), v_all.astype(dtype), KVCache(k_all, v_all)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=None, quantized: bool | str = False):
    """``quantized``: False (bf16), True / "int8", or "fp8_e4m3"."""
    dtype = dtype or cfg.dtype
    shape = (batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    sshape = shape[:-1]
    if quantized:
        fmt = "int8" if quantized is True else str(quantized)
        cdt = _KV_CODE_DTYPES[fmt]
        if fmt == "int4":  # two nibbles per byte, half-split along D;
            # asymmetric per-(token, head, D-half) scale+off
            shape = shape[:-1] + (cfg.head_dim // 2,)
            ssh2 = sshape + (2,)
            return [QuantKVCache(jnp.zeros(shape, cdt),
                                 jnp.ones(ssh2, jnp.float32),
                                 jnp.zeros(shape, cdt),
                                 jnp.ones(ssh2, jnp.float32),
                                 jnp.zeros(ssh2, jnp.float32),
                                 jnp.zeros(ssh2, jnp.float32))
                    for _ in range(cfg.num_hidden_layers)]
        return [QuantKVCache(jnp.zeros(shape, cdt),
                             jnp.ones(sshape, jnp.float32),
                             jnp.zeros(shape, cdt),
                             jnp.ones(sshape, jnp.float32))
                for _ in range(cfg.num_hidden_layers)]
    return [KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(cfg.num_hidden_layers)]


class RMSNorm(nnx.Module):
    def __init__(self, dim: int, eps: float, dtype=jnp.bfloat16):
        self.weight = nnx.Param(jnp.ones((dim,), dtype=jnp.float32))
        self.eps = eps
        self.dtype = dtype

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + self.eps)
        return (xn * self.weight[...]).astype(self.dtype)


def _rope(positions: jax.Array, head_dim: int, theta: float,
          partial_factor: float = 1.0, scaling: dict | None = None,
          max_position_embeddings: int = 0):
    """Rotary embedding tables: cos/sin [B, S, rd/2] (f32), where
    rd = partial_factor * head_dim is the rotated width.

    ``scaling`` (Phi-3 longrope / su-rope, HF
    ``_compute_longrope_parameters``): inv_freq is divided per-dim by the
    short or long factor — long iff the sequence reaches past the original
    training context (a scalar runtime select, not a recompile) — and
    cos/sin carry the attention factor sqrt(1 + ln(s)/ln(orig_max))
    whenever the configured context extends the original one."""
    rd = int(head_dim * partial_factor)
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    mscale = 1.0
    if scaling and scaling.get("type") in ("longrope", "su"):
        import math

        orig_max = int(scaling["original_max_position_embeddings"])
        s = max(max_position_embeddings, orig_max) / orig_max
        if s > 1.0:
            mscale = math.sqrt(1.0 + math.log(s) / math.log(orig_max))
        short = jnp.asarray(scaling["short_factor"],
                            dtype=jnp.float32)[: rd // 2]
        long = jnp.asarray(scaling["long_factor"],
                           dtype=jnp.float32)[: rd // 2]
        # HF switches factor sets when the runtime seq_len exceeds the
        # original context; both divisors are trace-time constants so this
        # is one scalar-predicated vector select inside jit
        is_long = (jnp.max(positions) + 1) > orig_max
        inv_freq = inv_freq / jnp.where(is_long, long, short)
    elif scaling and scaling.get("type") == "llama3":
        # HF _compute_llama3_parameters: low-frequency bands are divided
        # by `factor`, high-frequency bands pass through, the middle is a
        # smooth interpolation over wavelength
        import math

        factor = float(scaling["factor"])
        low_ff = float(scaling.get("low_freq_factor", 1.0))
        high_ff = float(scaling.get("high_freq_factor", 4.0))
        orig_max = float(scaling["original_max_position_embeddings"])
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        inv_freq = ((1.0 - smooth) * inv_freq / factor + smooth * inv_freq)
    elif scaling and scaling.get("type") == "yarn":
        # YaRN (HF _compute_yarn_parameters): interpolate low-frequency
        # bands by `factor`, keep high-frequency bands (extrapolation),
        # linear ramp between the beta_fast/beta_slow correction dims;
        # cos/sin carry the attention factor (paper's sqrt-scale fix)
        import math

        factor = float(scaling["factor"])
        orig_max = int(scaling.get("original_max_position_embeddings")
                       or max_position_embeddings)
        beta_fast = float(scaling.get("beta_fast") or 32)
        beta_slow = float(scaling.get("beta_slow") or 1)

        def _gm(scale, m=1.0):
            return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

        af = scaling.get("attention_factor")
        ms = scaling.get("mscale")
        msad = scaling.get("mscale_all_dim")
        if af is None:
            af = (_gm(factor, ms) / _gm(factor, msad)) if (ms and msad) \
                else _gm(factor)
        mscale = float(af)

        def _cdim(nrot):
            return (rd * math.log(orig_max / (nrot * 2 * math.pi))
                    / (2 * math.log(theta)))

        low, high = _cdim(beta_fast), _cdim(beta_slow)
        if scaling.get("truncate", True):
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, rd - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip(
            (jnp.arange(rd // 2, dtype=jnp.float32) - low) / (high - low),
            0.0, 1.0)
        extrap = 1.0 - ramp  # 1 = keep original freq, 0 = interpolate
        inv_freq = inv_freq / factor * (1.0 - extrap) + inv_freq * extrap
    elif scaling and scaling.get("type") == "linear":
        inv_freq = inv_freq / float(scaling["factor"])
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B,S,rd/2]
    return jnp.cos(angles) * mscale, jnp.sin(angles) * mscale


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               style: str = "half") -> jax.Array:
    """x: [B, S, H, D]; cos/sin [B, S, rd/2].

    ``half``: HF llama rotate-half over the first rd dims (rd from the
    table width; dims >= rd pass through — phi-3/phi-4 partial rotary,
    HF modeling_phi3 q_rot/q_pass split; rd == D for llama itself).
    ``interleaved_partial``: GLM rotate-every-two — pair (2i, 2i+1) of the
    first rd dims rotates by angle pos*inv_freq[i]; dims >= rd pass
    through (HF modeling_glm.apply_rotary_pos_emb)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    if style == "half":
        rd = 2 * cos.shape[-1]
        xr, xp = x[..., :rd], x[..., rd:]
        d2 = rd // 2
        x1, x2 = xr[..., :d2], xr[..., d2:]
        xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
        rot = jnp.concatenate(
            [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
        ).astype(x.dtype)
        return rot if rd == x.shape[-1] else jnp.concatenate(
            [rot, xp], axis=-1)
    assert style == "interleaved_partial", style
    rd = 2 * cos.shape[-1]
    xr = x[..., :rd].astype(jnp.float32)
    xp = x[..., rd:]
    x1, x2 = xr[..., 0::2], xr[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    rot = jnp.stack([r1, r2], axis=-1).reshape(xr.shape).astype(x.dtype)
    return jnp.concatenate([rot, xp], axis=-1)


class LlamaAttention(nnx.Module):
    def __init__(self, cfg: LlamaConfig, rngs: nnx.Rngs):
        H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        self.cfg = cfg
        lin = lambda i, o, b=False: nnx.Linear(
            i, o, use_bias=b, dtype=cfg.dtype, param_dtype=cfg.dtype,
            rngs=rngs)
        qb = cfg.attention_bias
        self.q_proj = lin(cfg.hidden_size, H * D, qb)
        self.k_proj = lin(cfg.hidden_size, Hkv * D, qb)
        self.v_proj = lin(cfg.hidden_size, Hkv * D, qb)
        self.o_proj = lin(H * D, cfg.hidden_size)
        self.qkv_proj = nnx.data(None)  # set by quantization.fuse.fuse_for_serving

    def __call__(self, x, cos, sin, mask, cache: KVCache | None = None,
                 cache_pos: jax.Array | None = None):
        cfg = self.cfg
        B, S, _ = x.shape
        H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        if self.qkv_proj is not None:
            qkv = self.qkv_proj(x)
            q, k, v = jnp.split(qkv, [H * D, (H + Hkv) * D], axis=-1)
            q = q.reshape(B, S, H, D)
            k = k.reshape(B, S, Hkv, D)
            v = v.reshape(B, S, Hkv, D)
        else:
            q = self.q_proj(x).reshape(B, S, H, D)
            k = self.k_proj(x).reshape(B, S, Hkv, D)
            v = self.v_proj(x).reshape(B, S, Hkv, D)
        q = apply_rope(q, cos, sin, cfg.rope_style)
        k = apply_rope(k, cos, sin, cfg.rope_style)
        # head-major [B, H, S, D]: matches the cache layout, no relayout in
        # the attention einsums
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out, new_cache = self._attend(x.dtype, q, k, v, mask, cache,
                                      cache_pos)
        return self.o_proj(out), new_cache

    def _attend(self, x_dtype, q, k, v, mask, cache, cache_pos):
        """Cache update + attention on head-major q/k/v; returns the
        flattened attention output [B, S, H*D] (pre-o_proj) and the new
        cache. Shared by the modular forward above and the fused decode
        layer (quantization/fuse.enable_fused_decode)."""
        cfg = self.cfg
        B, S = q.shape[0], q.shape[2]
        H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)

        if getattr(self, "kv_observe", False):
            # KV calibration (KVCacheQuantConfig per_channel_k): running
            # per-(kv-head, channel) amax of the post-rope keys — K error
            # is channel-dominated (KIVI), so int4 K wants channel scales
            self.kv_k_amax[...] = jnp.maximum(
                self.kv_k_amax[...],
                jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(0, 2)))

        from ..kernels.decode_attention import use_fused_decode_attention

        tp_mesh = getattr(self, "tp_mesh_attn", None)
        fused_ok = use_fused_decode_attention(B)
        new_cache = None
        if isinstance(cache, PagedKVCache):
            from ..kernels.paged_attention import (paged_decode_attention,
                                                   paged_window_attention,
                                                   paged_write_window)

            pos_b = jnp.broadcast_to(
                jnp.asarray(cache_pos, jnp.int32).reshape(-1), (B,))
            if S == 1:
                new_cache = _paged_write_row(cache, k, v, pos_b)
                lengths = pos_b + 1
                out = paged_decode_attention(q, new_cache, lengths)
                out = out.astype(x_dtype).transpose(0, 2, 1, 3)
                return out.reshape(B, S, H * D), new_cache
            # W-token verify window (speculative serving over pages):
            # write the window rows (may span one page boundary), then
            # causal windowed attention
            new_cache = paged_write_window(cache, k, v, pos_b)
            if new_cache is None:  # off-envelope: per-row fallback
                nc = cache
                for w_ in range(S):
                    nc = _paged_write_row(nc, k[:, :, w_:w_ + 1],
                                          v[:, :, w_:w_ + 1],
                                          pos_b + w_)
                new_cache = nc
            out = paged_window_attention(q, new_cache, pos_b + S)
            out = out.astype(x_dtype).transpose(0, 2, 1, 3)
            return out.reshape(B, S, H * D), new_cache
        if isinstance(cache, QuantKVCache):
            if (S == 1 and tp_mesh is None and fused_ok
                    and cache.fmt != "int4"
                    and not getattr(self, "fp8_sdpa", False)
                    and not getattr(self, "fp8_softmax", False)):
                # the fused kernel consumes element-width codes; int4
                # packed caches take the grouped code-domain path below.
                # fp8_sdpa models skip it: its score/prob math is bf16,
                # which would silently mix numerics with the patched
                # _fp8_dot path the rest of the model runs
                from ..kernels.decode_attention import decode_attention_quant

                out, new_cache = decode_attention_quant(q, k, v, cache,
                                                        cache_pos)
                out = out.astype(x_dtype).transpose(0, 2, 1, 3)
                return out.reshape(B, S, H * D), new_cache
            k_ch = (self.kv_k_scale[...]
                    if getattr(self, "kv_k_scale", None) is not None
                    and cache.fmt == "int4" else None)
            if k_ch is not None:
                # calibrated per-channel K scales (KIVI-style): codes are
                # k / scale[h, d]; the scale folds into q before the dot,
                # so the per-token k_scale rows stay 1 (and the affine
                # offs stay 0)
                c = jnp.clip(jnp.round(k.astype(jnp.float32)
                                       / k_ch[None, :, None, :]), -8, 7) + 8
                c = c.astype(jnp.uint8)
                hh = c.shape[-1] // 2
                kc = c[..., :hh] | (c[..., hh:] << 4)
                ks = jnp.ones(k.shape[:-1] + (2,), jnp.float32)
                koff = jnp.zeros(k.shape[:-1] + (2,), jnp.float32)
            elif cache.fmt == "int4":
                kc, ks, koff = _kv_quant4_asym(k)
            else:
                kc, ks = _kv_quant(k, fmt=cache.fmt)
                koff = None
            if cache.fmt == "int4":
                vc, vs, voff = _kv_quant4_asym(v)
            else:
                vc, vs = _kv_quant(v, fmt=cache.fmt)
                voff = None
            k_codes = _update_rows(cache.k_codes, kc, cache_pos)
            k_scale = _update_rows(cache.k_scale, ks, cache_pos)
            v_codes = _update_rows(cache.v_codes, vc, cache_pos)
            v_scale = _update_rows(cache.v_scale, vs, cache_pos)
            k_off = (None if koff is None
                     else _update_rows(cache.k_off, koff, cache_pos))
            v_off = (None if voff is None
                     else _update_rows(cache.v_off, voff, cache_pos))
            new_cache = QuantKVCache(k_codes, k_scale, v_codes, v_scale,
                                     k_off, v_off)
            if not (getattr(self, "fp8_sdpa", False)
                    or getattr(self, "fp8_softmax", False)):
                if S == 1 and new_cache.fmt != "int4" and k_ch is None:
                    # batched flash-decode kernel: bh-tiled cache reads at
                    # full HBM bandwidth (the XLA einsum path below runs
                    # ~525 GB/s at B=16 — PERF_NOTES "Batched decode")
                    from ..kernels.decode_attention import \
                        batched_decode_attention

                    out = batched_decode_attention(q, k_codes, v_codes,
                                                   cache_pos, k_scale,
                                                   v_scale)
                    if out is not None:
                        out = out.astype(x_dtype).transpose(0, 2, 1, 3)
                        return out.reshape(B, S, H * D), new_cache
                # attention straight on the cache codes: the convert fuses
                # into the QK^T/PV fusions so the cache streams from HBM at
                # code width, and GQA grouping avoids materializing the
                # repeated K/V; per-token scales fold into scores/probs
                # (same math as the fused decode kernel). Measured B=16
                # int8-KV: 31.4 -> 30.1 ms/step (PERF_NOTES round 2).
                if new_cache.fmt == "int4":
                    out = _grouped_attention_int4(q, k_codes, v_codes,
                                                  mask, D, k_scale, v_scale,
                                                  k_off=k_off, v_off=v_off,
                                                  k_channel_scale=k_ch)
                else:
                    out = _grouped_attention(q, k_codes.astype(x_dtype),
                                             v_codes.astype(x_dtype),
                                             mask, D, k_scale, v_scale)
                out = out.transpose(0, 2, 1, 3).reshape(B, S, H * D)
                return out, new_cache
            if new_cache.fmt == "int4":
                k = _kv_dequant4_asym(k_codes, k_scale, k_off, x_dtype)
                v = _kv_dequant4_asym(v_codes, v_scale, v_off, x_dtype)
            else:
                k = _kv_dequant(k_codes, k_scale, x_dtype)
                v = _kv_dequant(v_codes, v_scale, x_dtype)
        elif cache is not None:
            if (S == 1 and fused_ok
                    and not getattr(self, "fp8_softmax", False)
                    and not getattr(self, "fp8_sdpa", False)):
                # fused decode kernel: in-place cache update + attention in
                # one pallas call (per-op overhead dominates decode);
                # under a TP mesh it runs per head-shard via shard_map
                from ..kernels.decode_attention import (
                    decode_attention, decode_attention_tp)

                if tp_mesh is not None:
                    out, k_all, v_all = decode_attention_tp(
                        q, k.astype(cache.k.dtype), v.astype(cache.v.dtype),
                        cache.k, cache.v, cache_pos, tp_mesh,
                        *self.tp_attn_axes)
                else:
                    out, k_all, v_all = decode_attention(
                        q, k.astype(cache.k.dtype), v.astype(cache.v.dtype),
                        cache.k, cache.v, cache_pos)
                new_cache = KVCache(k_all, v_all)
                out = out.astype(x_dtype).transpose(0, 2, 1, 3)
                return out.reshape(B, S, H * D), new_cache
            k_all = _update_rows(cache.k, k, cache_pos)
            v_all = _update_rows(cache.v, v, cache_pos)
            new_cache = KVCache(k_all, v_all)
            if (S == 1 and not getattr(self, "fp8_sdpa", False)
                    and not getattr(self, "fp8_softmax", False)):
                # batched flash-decode kernel over the updated bf16 cache
                from ..kernels.decode_attention import \
                    batched_decode_attention

                out = batched_decode_attention(q, k_all, v_all, cache_pos)
                if out is not None:
                    out = out.astype(x_dtype).transpose(0, 2, 1, 3)
                    return out.reshape(B, S, H * D), new_cache
            k, v = k_all.astype(x_dtype), v_all.astype(x_dtype)

        if (getattr(self, "fp8_sdpa", False)
                or getattr(self, "fp8_softmax", False)):
            # fp8 SDPA / fp8 softmax (reference PatchedModuleFusedSDPA /
            # PatchedSoftmax, helper_modules.py:1450,1579) — shared zoo
            # implementation
            from .sdpa import sdpa

            out = sdpa(q, k, v, mask, module=self, out_dtype=x_dtype)
        else:
            out = _grouped_attention(q, k, v, mask, D)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        return out, new_cache


class LlamaMLP(nnx.Module):
    def __init__(self, cfg: LlamaConfig, rngs: nnx.Rngs):
        lin = lambda i, o: nnx.Linear(i, o, use_bias=False, dtype=cfg.dtype,
                                      param_dtype=cfg.dtype, rngs=rngs)
        self.gate_proj = lin(cfg.hidden_size, cfg.intermediate_size)
        self.up_proj = lin(cfg.hidden_size, cfg.intermediate_size)
        self.down_proj = lin(cfg.intermediate_size, cfg.hidden_size)
        self.gate_up_proj = nnx.data(None)  # set by quantization.fuse.fuse_for_serving

    def __call__(self, x):
        if self.gate_up_proj is not None:
            gu = self.gate_up_proj(x)
            g, u = jnp.split(gu, 2, axis=-1)
            return self.down_proj(nnx.silu(g) * u)
        return self.down_proj(nnx.silu(self.gate_proj(x)) * self.up_proj(x))


class LlamaDecoderLayer(nnx.Module):
    def __init__(self, cfg: LlamaConfig, rngs: nnx.Rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.dtype)
        self.self_attn = LlamaAttention(cfg, rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size,
                                                cfg.rms_norm_eps, cfg.dtype)
        self.mlp = LlamaMLP(cfg, rngs)

    def __call__(self, x, cos, sin, mask, cache=None, cache_pos=None):
        if (getattr(self, "fused_decode", False) and x.shape[0] == 1
                and x.shape[1] == 1 and cache is not None):
            r = self._fused_call(x, cos, sin, mask, cache, cache_pos)
            if r is not None:
                return r
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin, mask,
                                      cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache

    def _fused_call(self, x, cos, sin, mask, cache, cache_pos):
        """Fused B=1 decode: each projection is ONE pallas call that also
        performs the adjacent glue (kernels/fused_matvec.py — RMSNorm by
        scale invariance, act quant, silu(g)*u, residual adds). Enabled by
        ``quantization.fuse.enable_fused_decode``; returns None to fall
        back to the modular path (off-TPU, ineligible weights)."""
        from ..kernels.fused_matvec import fused_matvec

        attn, mlp = self.self_attn, self.mlp
        cfg = attn.cfg
        B, S, _ = x.shape
        H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        qkv_m, gu_m = attn.qkv_proj, mlp.gate_up_proj
        if qkv_m is None or gu_m is None:
            return None
        for m in (qkv_m, attn.o_proj, gu_m, mlp.down_proj):
            if getattr(m, "pre_scale", None) is not None or \
                    getattr(m, "tp_role", None) is not None:
                return None
        fold_norms = getattr(self, "fused_fold_norms", True)
        qkv = fused_matvec(
            x if fold_norms else self.input_layernorm(x),
            qkv_m.packed_weight(),
            rms_w=(self.input_layernorm.weight[...] if fold_norms else None),
            eps=self.input_layernorm.eps,
            bias=None if qkv_m.bias is None else qkv_m.bias[...],
            out_dtype=x.dtype)
        if qkv is None:
            return None
        q, k, v = jnp.split(qkv, [H * D, (H + Hkv) * D], axis=-1)
        q = apply_rope(q.reshape(B, S, H, D), cos, sin, cfg.rope_style)
        k = apply_rope(k.reshape(B, S, Hkv, D), cos, sin, cfg.rope_style)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        x1 = None
        from ..kernels import fused_matvec as _fm

        if (_fm.ATTN_O_FUSED and attn.o_proj.bias is None
                and not getattr(attn, "fp8_sdpa", False)
                and not getattr(attn, "fp8_softmax", False)):
            # attention fused INTO the o-projection kernel (one pallas
            # call; the per-head outputs never leave VMEM). A/B lever,
            # default OFF: measured SLOWER on llama3 (168.3 vs 171.5
            # tok/s — the in-prologue attention stalls the N-tile weight
            # pipeline) and the 32-head unroll fails to compile on
            # llama2 (PERF_NOTES.md round-3 megakernel note).
            r = _fm.attn_o_fused(q, k, v, cache, cache_pos,
                                 attn.o_proj.packed_weight(), residual=x,
                                 out_dtype=x.dtype)
            if r is not None:
                x1, new_cache = r
        if x1 is None:
            out, new_cache = attn._attend(x.dtype, q, k, v, mask, cache,
                                          cache_pos)
            from ..kernels import omlp_matvec as _om

            if (_om.OMLP_FUSED and fold_norms and attn.o_proj.bias is None
                    and gu_m.bias is None and mlp.down_proj.bias is None):
                # decoder-block megakernel: o + gate/up + down as phases
                # of ONE pallas call — the next phase's weight tiles
                # prefetch during the current phase's compute, removing
                # two kernel-boundary pipeline ramps per layer
                # (kernels/omlp_matvec.py)
                x2 = _om.omlp_fused(
                    out, attn.o_proj.packed_weight(),
                    gu_m.packed_weight(), mlp.down_proj.packed_weight(),
                    residual=x,
                    rms_w=self.post_attention_layernorm.weight[...],
                    eps=self.post_attention_layernorm.eps,
                    out_dtype=x.dtype)
                if x2 is not None:
                    return x2, new_cache
            x1 = fused_matvec(out, attn.o_proj.packed_weight(), residual=x,
                              bias=None if attn.o_proj.bias is None
                              else attn.o_proj.bias[...], out_dtype=x.dtype)
        if x1 is None:
            return None
        h = fused_matvec(
            x1 if fold_norms else self.post_attention_layernorm(x1),
            gu_m.packed_weight(),
            rms_w=(self.post_attention_layernorm.weight[...]
                   if fold_norms else None),
            eps=self.post_attention_layernorm.eps,
            silu_gate=True, out_dtype=x.dtype)
        if h is None:
            return None
        x2 = fused_matvec(h, mlp.down_proj.packed_weight(), residual=x1,
                          out_dtype=x.dtype)
        if x2 is None:
            return None
        return x2, new_cache


class LlamaModel(nnx.Module):
    def __init__(self, cfg: LlamaConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                      dtype=cfg.dtype, param_dtype=cfg.dtype,
                                      rngs=rngs)
        self.layers = nnx.List(
            [LlamaDecoderLayer(cfg, rngs) for _ in range(cfg.num_hidden_layers)])
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.dtype)

    def __call__(self, input_ids, positions=None, caches=None, cache_pos=None,
                 inputs_embeds=None):
        cfg = self.cfg
        if inputs_embeds is not None:
            # multimodal callers (models/llava.py) splice non-text
            # embeddings in before the decoder stack (HF inputs_embeds)
            B, S = inputs_embeds.shape[:2]
        else:
            B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = (inputs_embeds if inputs_embeds is not None
             else self.embed_tokens(input_ids))
        # sequence parallelism: models/sharding.enable_sequence_parallel
        # pins the activations' token axis to a mesh axis; XLA inserts
        # the collectives attention needs to see the full sequence
        asc = getattr(self, "activation_sharding", None)
        if asc is not None:
            x = jax.lax.with_sharding_constraint(x, asc)
        cos, sin = _rope(positions, cfg.head_dim, cfg.rope_theta,
                         cfg.partial_rotary_factor, cfg.rope_scaling,
                         cfg.max_position_embeddings)

        if caches is None:
            if S * S > _DENSE_MASK_ELEMS:  # long prefill: chunked path
                mask = _ChunkedCausal(jnp.arange(S)[None])
            else:
                # causal mask [1, 1, S, S]
                mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]  # [B, H, T, D] head-major cache
            if S * T > _DENSE_MASK_ELEMS and S > 1:
                mask = _ChunkedCausal(positions)
            else:
                # positions of cached keys: valid if key_pos <= query_pos
                key_pos = jnp.arange(T)[None, None, None, :]
                mask = key_pos <= positions[:, None, :, None]

        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache = caches[i] if caches is not None else None
            x, nc = layer(x, cos, sin, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        if getattr(self, "norm_in_head", False):
            # fused decode folds the final norm into the lm_head kernel
            # (quantization.fuse.enable_fused_decode); the CausalLM wrapper
            # applies self.norm itself when it cannot fuse
            return x, new_caches
        return self.norm(x), new_caches


class LlamaForCausalLM(nnx.Module):
    def __init__(self, cfg: LlamaConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.model = LlamaModel(cfg, rngs)
        if not cfg.tie_word_embeddings:
            self.lm_head = nnx.Linear(cfg.hidden_size, cfg.vocab_size,
                                      use_bias=False, dtype=cfg.dtype,
                                      param_dtype=cfg.dtype, rngs=rngs)
        else:
            self.lm_head = None

    def __call__(self, input_ids, positions=None, caches=None, cache_pos=None,
                 inputs_embeds=None):
        x, new_caches = self.model(input_ids, positions, caches, cache_pos,
                                   inputs_embeds=inputs_embeds)
        logits = None
        if getattr(self.model, "norm_in_head", False):
            if (self.lm_head is not None and x.shape[0] == 1
                    and x.shape[1] == 1
                    and hasattr(self.lm_head, "packed_weight")
                    and getattr(self.lm_head, "pre_scale", None) is None):
                from ..kernels.fused_matvec import fused_matvec

                logits = fused_matvec(
                    x, self.lm_head.packed_weight(),
                    rms_w=self.model.norm.weight[...],
                    eps=self.model.norm.eps, out_dtype=x.dtype)
            if logits is None:
                x = self.model.norm(x)
        if logits is None:
            if self.lm_head is not None:
                logits = self.lm_head(x)
            else:
                logits = self.model.embed_tokens.attend(x)
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides) -> "LlamaForCausalLM":
        params = dict(LLAMA_PRESETS[name])
        params.update(overrides)
        return cls(LlamaConfig(**params), nnx.Rngs(seed))


def build_quantized(preset_or_cfg, quant_config, seed: int = 0,
                    presets=None):
    """Construct a llama and quantize it **layer by layer** so the full fp
    model never resides in HBM (an 8B bf16 model alone fills a 16 GB chip).
    Only calibration-free configs (RTN/HQQ-style) apply here."""
    from ..quantization.quantize import quantize as _quantize

    if isinstance(preset_or_cfg, LlamaConfig):
        cfg = preset_or_cfg
    else:
        params = dict((presets or LLAMA_PRESETS)[preset_or_cfg])
        cfg = LlamaConfig(**params)
    n_layers = cfg.num_hidden_layers
    cfg_one = dataclasses.replace(cfg, num_hidden_layers=0)
    model = LlamaForCausalLM(cfg_one, nnx.Rngs(seed))
    model.cfg = cfg
    model.model.cfg = cfg
    rngs = nnx.Rngs(seed + 1)
    for _ in range(n_layers):
        layer = LlamaDecoderLayer(cfg, rngs)
        holder = _LayerHolder(layer)
        _quantize(holder, quant_config)
        model.model.layers.append(holder.layer)
        # model-LEVEL attrs the entries set land on the per-layer holder
        # here — propagate them or generation/serving silently fall back
        # to bf16 KV caches (round-4 regression: engine_throughput ran
        # bf16 KV while claiming int8)
        if getattr(holder, "kv_cache_quantized", False):
            model.kv_cache_quantized = True
            model.kv_cache_format = holder.kv_cache_format
    if getattr(quant_config, "quant_lm_head", False) and \
            model.lm_head is not None:
        # the head is the single largest weight (262 MB bf16 at 7B);
        # quantizing it saves ~0.25 ms/decode step (PERF_NOTES open levers)
        holder = _LayerHolder(model.lm_head)
        _quantize(holder, quant_config)
        model.lm_head = holder.layer
    return model


class _LayerHolder(nnx.Module):
    """Wraps one decoder layer so the quantize pass sees a walkable root."""

    def __init__(self, layer):
        self.layer = layer
