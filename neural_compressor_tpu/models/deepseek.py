"""DeepSeek-V3 family causal LM (NNX, TPU-first): Multi-head Latent
Attention (MLA) + sigmoid-routed MoE with shared experts.

The reference quantizes DeepSeek-V3 through its FP8/EP patched modules
(``PatchedGaudiDeepseekV3MoE``, ``PatchedMoeFP8Matmul`` —
fp8_quant/_quant_common/helper_modules.py:815,910-1103); here the family
is a native zoo member: every projection (including the MLA low-rank
a/b factors and all expert MLPs) is a plain ``nnx.Linear``, so RTN/GPTQ/
AWQ/FP8/... quantize it with zero extra machinery. Math verified against
HF modeling_deepseek_v3.py.

MLA (DeepseekV3Attention):
  * q: optional low-rank path ``q_b(q_a_norm(q_a(x)))`` (q_lora_rank)
  * kv: ONE down-projection ``kv_a_proj_with_mqa`` -> [kv_lora_rank
    (latent) | qk_rope_head_dim (shared rope key)]; the latent is
    RMS-normed and up-projected per head to [qk_nope | v]
  * per-head query/key = [nope | rope] concat; the rope part of K is
    SHARED across heads (MQA-style), broadcast after rotation
  * scaling = qk_head_dim ** -0.5

Router (DeepseekV3TopkRouter): sigmoid scores; selection adds a
per-expert bias (e_score_correction_bias) and is GROUP-LIMITED (top
``topk_group`` of ``n_group`` groups by sum of each group's top-2
scores); combine weights are the ORIGINAL sigmoid scores of the selected
experts, optionally normalized, times routed_scaling_factor. Shared
experts always run and add to the routed output.

Caches follow the zoo ``KVCache`` protocol but with MLA's asymmetric
dims (K: qk_head_dim, V: v_head_dim) — the model provides
``init_caches`` which ``generation`` prefers over the llama-shaped
default.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from typing import NamedTuple

from .llama import (KVCache, QuantKVCache, RMSNorm, _KV_CODE_DTYPES,
                    _kv_quant, _rope, _update_rows, apply_rope,
                    update_cache)


class LatentKVCache(NamedTuple):
    """MLA latent cache: ONE row per token of [kv_lora_rank (post-norm
    latent) | qk_rope_head_dim (rotated shared key)] — [B, 1, T, r+dr],
    independent of the head count. At deepseek-v3 scale that is 576 f/tok
    vs the 40960 of expanded per-head K/V (71x); attention runs in the
    ABSORBED form (DeepSeek-V2 paper §2.1): kv_b's key half folds into
    the query, its value half applies after the probs·latent dot, so the
    latent is both K and V and is never expanded per head."""

    lat: jax.Array


class QuantLatentKVCache(NamedTuple):
    """int8 / fp8-e4m3 MLA latent cache: the [r+dr] row quantizes with
    ONE per-token scale (the latent is both K and V, so a single
    code+scale pair serves the score AND output dots — the scale folds
    into scores/probs exactly like the llama quantized caches). Halves
    the already-71x-compressed latent's HBM bytes again; Δppl measured
    through decode on the trained tiny_mla (test_accuracy_battery)."""

    codes: jax.Array   # int8 | float8_e4m3fn [B, 1, T, r+dr]
    scale: jax.Array   # f32 [B, 1, T]

    @property
    def fmt(self) -> str:
        return "int8" if self.codes.dtype == jnp.int8 else "fp8_e4m3"


class Quant4LatentKVCache(NamedTuple):
    """Packed int4 MLA latent cache: 4x capacity over bf16 latent (at
    deepseek-v3 scale ~284x under expanded bf16 K/V). The row's parts —
    post-norm latent halves [0, r/2), [r/2, r) and the rotated shared
    key [r, C) — each pack with their own per-token affine pair; the
    value dot consumes only the v-part, whose codes pack separately
    from the rope-part so unpacking needs no cross-part nibble surgery.

    ACCURACY NOTE (measured, tiny_mla decode): Δppl **+0.18** — about
    2x the int4 cost of expanded-KV caches, and granularity does NOT
    close it (row-wide +0.33, per-part +0.179, per-half-v +0.178): the
    latent serves as BOTH K and V, so its quantization error is
    CORRELATED across the score and value dots instead of averaging
    out. This format is a capacity-over-accuracy option; int8 latent
    (`QuantLatentKVCache`, +0.002) is the accuracy-safe default."""

    codes_v: jax.Array    # uint8 [B, 1, T, r/2] (lo nibble: half 0)
    codes_rot: jax.Array  # uint8 [B, 1, T, dr/2] (half-split within dr)
    scale_v: jax.Array    # f32 [B, 1, T, 2] (per r/2-half affine)
    off_v: jax.Array      # f32 [B, 1, T, 2]
    scale_r: jax.Array    # f32 [B, 1, T]
    off_r: jax.Array      # f32 [B, 1, T]


def _lat4_quant_part(part):
    xf = part.astype(jnp.float32)
    mn = jnp.min(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    scale = jnp.where(mx - mn <= 0, 1.0, (mx - mn) / 15.0)
    c = jnp.clip(jnp.round((xf - mn[..., None]) / scale[..., None]),
                 0, 15).astype(jnp.uint8)
    h = c.shape[-1] // 2
    return c[..., :h] | (c[..., h:] << 4), scale, mn + 8.0 * scale


def _lat4_quant(row, r: int):
    """[B, 1, S, C] latent rows -> packed code pair + per-part affines.

    The v-part (latent, [0, r)) carries BOTH dots, so it splits into two
    r/2 halves with independent affine pairs (same trade as the llama
    contiguous cache's per-D-half form): the packed byte's low nibble is
    a first-half channel and the high nibble its second-half partner, so
    each nibble's dequant scale is just its half's pair. scale_v/off_v
    are [..., 2]; the rope part keeps one pair."""
    h = r // 2
    c0, s0, o0 = _lat4_quant_part(row[..., :h])
    c1, s1, o1 = _lat4_quant_part(row[..., h:r])
    # re-pack the two half codes into ONE [.., r/2] byte array: low
    # nibble = first half, high = second (they arrive half-split within
    # their own halves — unpack to raw codes first)
    def unpack_codes(c):
        lo = (c & 15)
        hi = (c >> 4)
        return jnp.concatenate([lo, hi], axis=-1)
    cv = (unpack_codes(c0) | (unpack_codes(c1) << 4)).astype(jnp.uint8)
    sv = jnp.stack([s0, s1], axis=-1)
    ov = jnp.stack([o0, o1], axis=-1)
    cr, sr, orr = _lat4_quant_part(row[..., r:])
    return cv, cr, sv, ov, sr, orr


def _lat4_unpack(codes):
    """packed uint8 [..., W/2] -> centered f32-able codes [..., W]."""
    lo = (codes & 15).astype(jnp.int8) - 8
    hi = (codes >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-1)


class PagedLatentKVCache(NamedTuple):
    """Paged MLA latent cache (decode-only): page pool
    [P, 1, page, r+dr] + per-slot block tables — the 71x latent
    compression plus allocator elasticity (kernels.paged_attention
    "MLA latent paging"). The reference has no MLA paging (its serving
    story delegates to vLLM, helper_modules.py:1178)."""

    lat_pages: jax.Array           # [P, 1, page, r+dr]
    block_tables: jax.Array        # [B, PMAX] int32

    @property
    def page_size(self) -> int:
        return self.lat_pages.shape[2]


def init_paged_latent_pool(cfg: "DeepseekConfig", n_pages: int,
                           batch: int, max_len: int,
                           page_size: int = 128):
    """Per-layer ``PagedLatentKVCache`` pools with empty block tables
    (model must be in latent-cache mode: enable_mla_latent_cache)."""
    C = cfg.kv_lora_rank + cfg.qk_rope_head_dim
    pmax = (max_len + page_size - 1) // page_size
    return [PagedLatentKVCache(
        jnp.zeros((n_pages, 1, page_size, C), cfg.dtype),
        jnp.zeros((batch, pmax), jnp.int32))
        for _ in range(cfg.num_hidden_layers)]


@dataclasses.dataclass
class DeepseekConfig:
    vocab_size: int = 129280
    hidden_size: int = 7168
    intermediate_size: int = 18432       # dense layers
    moe_intermediate_size: int = 2048    # per routed/shared expert
    num_hidden_layers: int = 61
    num_attention_heads: int = 128
    # MLA
    q_lora_rank: int | None = 1536       # None = direct q_proj
    kv_lora_rank: int = 512
    qk_rope_head_dim: int = 64
    qk_nope_head_dim: int = 128
    v_head_dim: int = 128
    # MoE
    n_routed_experts: int = 256
    num_experts_per_tok: int = 8
    n_shared_experts: int = 1
    n_group: int = 8
    topk_group: int = 4
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 2.5
    first_k_dense_replace: int = 3       # leading layers use a dense MLP
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_interleave: bool = True
    # yarn long-context scaling (deepseek-v3 ships factor=40 yarn with
    # mscale/mscale_all_dim=1.0); consumed by llama._rope("yarn") and by
    # the mscale^2 attention-scale correction below
    rope_scaling: dict | None = None
    attention_bias: bool = False
    tie_word_embeddings: bool = False
    dtype: object = jnp.bfloat16

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    # protocol fields some zoo utilities read; MLA caches are allocated by
    # the model's own init_caches (K and V widths differ)
    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.qk_head_dim

    def __post_init__(self):
        assert self.n_routed_experts % self.n_group == 0, \
            "n_routed_experts must divide into n_group groups"

    @property
    def attn_scale(self) -> float:
        """qk_head_dim**-0.5, times yarn's mscale^2 when mscale_all_dim
        is set (HF DeepseekV3Attention.__init__:372-378)."""
        import math

        s = self.qk_head_dim ** -0.5
        rs = self.rope_scaling
        if rs and rs.get("mscale_all_dim"):
            f = float(rs["factor"])
            m = (0.1 * float(rs["mscale_all_dim"]) * math.log(f) + 1.0
                 if f > 1 else 1.0)
            s = s * m * m
        return s


DEEPSEEK_PRESETS = {
    "deepseek-test": dict(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, q_lora_rank=32, kv_lora_rank=16,
        qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=4, topk_group=2, first_k_dense_replace=1,
        max_position_embeddings=128),
    # deepseek-v3/r1 671B shape (config.json values) — for documentation
    # and sharding-rule sanity; far beyond one chip
    "deepseek-v3": dict(),
}


class DeepseekMLP(nnx.Module):
    """SwiGLU MLP, llama naming (HF DeepseekV3MLP)."""

    def __init__(self, cfg: DeepseekConfig, intermediate: int,
                 rngs: nnx.Rngs):
        lin = lambda i, o: nnx.Linear(i, o, use_bias=False, dtype=cfg.dtype,
                                      param_dtype=cfg.dtype, rngs=rngs)
        self.gate_proj = lin(cfg.hidden_size, intermediate)
        self.up_proj = lin(cfg.hidden_size, intermediate)
        self.down_proj = lin(intermediate, cfg.hidden_size)

    def __call__(self, x):
        return self.down_proj(nnx.silu(self.gate_proj(x)) * self.up_proj(x))


class DeepseekTopkRouter(nnx.Module):
    """Raw-parameter router (NOT a Linear, so no quantization pass ever
    touches it — the reference likewise keeps routers fp)."""

    def __init__(self, cfg: DeepseekConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.weight = nnx.Param(
            jax.random.normal(rngs.params(),
                              (cfg.n_routed_experts, cfg.hidden_size),
                              jnp.float32) * 0.02)
        self.e_score_correction_bias = nnx.Param(
            jnp.zeros((cfg.n_routed_experts,), jnp.float32))

    def __call__(self, xt: jax.Array):
        """xt [T, H] -> (topk_indices [T, k], topk_weights [T, k] f32)."""
        cfg = self.cfg
        E, G = cfg.n_routed_experts, cfg.n_group
        scores = jax.nn.sigmoid(
            xt.astype(jnp.float32) @ self.weight[...].T)      # [T, E]
        sc = scores + self.e_score_correction_bias[...][None, :]
        # group-limited selection: a group's score is the sum of its top-2
        group_scores = jnp.sum(
            jax.lax.top_k(sc.reshape(-1, G, E // G), 2)[0], axis=-1)
        _, gidx = jax.lax.top_k(group_scores, cfg.topk_group)  # [T, tg]
        gmask = jnp.any(
            jax.nn.one_hot(gidx, G, dtype=jnp.bool_), axis=1)  # [T, G]
        emask = jnp.repeat(gmask, E // G, axis=-1)             # [T, E]
        masked = jnp.where(emask, sc, 0.0)  # sigmoid scores are >= 0
        _, topi = jax.lax.top_k(masked, cfg.num_experts_per_tok)
        topw = jnp.take_along_axis(scores, topi, axis=-1)
        if cfg.norm_topk_prob:
            topw = topw / (jnp.sum(topw, axis=-1, keepdims=True) + 1e-20)
        return topi, topw * cfg.routed_scaling_factor


class DeepseekMoE(nnx.Module):
    """Dense-dispatch MoE (every expert on every token, combined with the
    sparse routing weights) + always-on shared experts. Exact and
    gather-free — the form quantization passes calibrate through; sparse
    capacity-based dispatch over stacked [E, ...] kernels is the mixtral
    ``StackedMoEBlock`` pattern (models/mixtral.py) and shards the expert
    axis for EP the same way."""

    def __init__(self, cfg: DeepseekConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.gate = DeepseekTopkRouter(cfg, rngs)
        self.experts = nnx.List(
            [DeepseekMLP(cfg, cfg.moe_intermediate_size, rngs)
             for _ in range(cfg.n_routed_experts)])
        self.shared_experts = DeepseekMLP(
            cfg, cfg.moe_intermediate_size * cfg.n_shared_experts, rngs)

    def __call__(self, x):
        cfg = self.cfg
        B, S, H = x.shape
        xt = x.reshape(B * S, H)
        topi, topw = self.gate(xt)
        E = cfg.n_routed_experts
        onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)    # [T, k, E]
        w_full = jnp.einsum("tke,tk->te", onehot, topw)        # [T, E]
        out = jnp.zeros_like(xt, dtype=jnp.float32)
        for e, expert in enumerate(self.experts):
            out = out + expert(xt).astype(jnp.float32) * w_full[:, e:e + 1]
        out = out.astype(x.dtype).reshape(B, S, H)
        return out + self.shared_experts(x)


class DeepseekAttention(nnx.Module):
    """MLA (HF DeepseekV3Attention, modeling_deepseek_v3.py:327-447)."""

    def __init__(self, cfg: DeepseekConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        H = cfg.num_attention_heads
        lin = lambda i, o, b=False: nnx.Linear(
            i, o, use_bias=b, dtype=cfg.dtype, param_dtype=cfg.dtype,
            rngs=rngs)
        if cfg.q_lora_rank is None:
            self.q_proj = lin(cfg.hidden_size, H * cfg.qk_head_dim)
            self.q_a_proj = self.q_a_layernorm = self.q_b_proj = \
                nnx.data(None)
        else:
            self.q_proj = nnx.data(None)
            self.q_a_proj = lin(cfg.hidden_size, cfg.q_lora_rank,
                                cfg.attention_bias)
            self.q_a_layernorm = RMSNorm(cfg.q_lora_rank, cfg.rms_norm_eps,
                                         cfg.dtype)
            self.q_b_proj = lin(cfg.q_lora_rank, H * cfg.qk_head_dim)
        self.kv_a_proj_with_mqa = lin(
            cfg.hidden_size, cfg.kv_lora_rank + cfg.qk_rope_head_dim,
            cfg.attention_bias)
        self.kv_a_layernorm = RMSNorm(cfg.kv_lora_rank, cfg.rms_norm_eps,
                                      cfg.dtype)
        self.kv_b_proj = lin(cfg.kv_lora_rank,
                             H * (cfg.qk_nope_head_dim + cfg.v_head_dim))
        self.o_proj = lin(H * cfg.v_head_dim, cfg.hidden_size,
                          cfg.attention_bias)
        # absorbed kv_b factors for the latent-cache path
        # (enable_mla_latent_cache): [r, H, dn] and [r, H, dv]
        self.w_k_absorb = nnx.data(None)
        self.w_v_absorb = nnx.data(None)

    def _rot(self, x, cos, sin):
        """Rope over the qk_rope slice. ``rope_interleave`` checkpoints
        store pairs interleaved; HF regroups (even|odd) then rotates-half
        — the SAME permutation on q and k keeps their dot invariant."""
        if self.cfg.rope_interleave:
            x = jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)
        return apply_rope(x, cos, sin, "half")

    def __call__(self, x, cos, sin, mask, cache=None, cache_pos=None):
        cfg = self.cfg
        B, S, _ = x.shape
        H = cfg.num_attention_heads
        dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        if self.q_proj is not None:
            q = self.q_proj(x)
        else:
            q = self.q_b_proj(self.q_a_layernorm(self.q_a_proj(x)))
        q = q.reshape(B, S, H, dn + dr)
        q_nope, q_rot = q[..., :dn], q[..., dn:]
        ckv = self.kv_a_proj_with_mqa(x)                     # [B,S,r+dr]
        latent, k_rot = ckv[..., :cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
        if isinstance(cache, (LatentKVCache, PagedLatentKVCache,
                              QuantLatentKVCache, Quant4LatentKVCache)):
            return self._latent_attend(x, q_nope, q_rot, latent, k_rot,
                                       cos, sin, mask, cache, cache_pos)
        kv = self.kv_b_proj(self.kv_a_layernorm(latent))
        kv = kv.reshape(B, S, H, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]
        q_rot = self._rot(q_rot, cos, sin)
        k_rot = self._rot(k_rot[:, :, None, :], cos, sin)    # [B,S,1,dr]
        k_rot = jnp.broadcast_to(k_rot, (B, S, H, dr))
        q = jnp.concatenate([q_nope, q_rot], axis=-1).transpose(0, 2, 1, 3)
        k = jnp.concatenate([k_nope, k_rot], axis=-1).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)                          # [B,H,S,dv]
        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)
        from .llama import _densify

        mask = _densify(mask, k.shape[2])  # expanded path stays dense
        s = jnp.einsum("bhsd,bhtd->bhst", q, k,
                       preferred_element_type=jnp.float32)
        s = s * cfg.attn_scale
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhst,bhtd->bhsd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, S, H * dv)
        return self.o_proj(out), new_cache

    def _latent_attend(self, x, q_nope, q_rot, latent, k_rot, cos, sin,
                       mask, cache: LatentKVCache, cache_pos):
        """Absorbed-form MLA over the latent cache. Scores:
        q_nope·k_nope == (q_nope @ W_k^T)·c, so the per-head key never
        materializes; output: probs·c then the per-head value factor.
        Exactly the expanded math (tests assert equality) at r+dr score
        width instead of (dn+dr) — the classic MLA FLOPs-for-HBM trade,
        which wins at decode where the cache read is the bottleneck."""
        cfg = self.cfg
        B, S, _ = x.shape
        H, dv = cfg.num_attention_heads, cfg.v_head_dim
        r = cfg.kv_lora_rank
        assert self.w_k_absorb is not None, \
            "latent cache needs enable_mla_latent_cache(model) first"
        c = self.kv_a_layernorm(latent)                       # [B,S,r]
        q_rot = self._rot(q_rot, cos, sin)
        krot = self._rot(k_rot[:, :, None, :], cos, sin)[:, :, 0]
        row = jnp.concatenate([c, krot.astype(c.dtype)], -1)[:, None]
        q_abs = jnp.einsum("bshd,rhd->bshr", q_nope,
                           self.w_k_absorb[...],
                           preferred_element_type=jnp.float32)
        qcat = jnp.concatenate([q_abs.astype(x.dtype), q_rot], axis=-1)
        if isinstance(cache, PagedLatentKVCache):
            from ..kernels.paged_attention import (paged_latent_attention,
                                                   paged_write_latent)

            assert S == 1, "paged latent cache is decode-only"
            pos_b = jnp.broadcast_to(
                jnp.asarray(cache_pos, jnp.int32).reshape(-1), (B,))
            pages = paged_write_latent(cache.lat_pages,
                                       cache.block_tables,
                                       row[:, 0, 0], pos_b)
            if pages is None:  # off-envelope: XLA scatter fallback
                page = cache.page_size
                pids = jnp.take_along_axis(
                    cache.block_tables.astype(jnp.int32),
                    (pos_b // page)[:, None], axis=1)[:, 0]
                pages = cache.lat_pages.at[pids, 0, pos_b % page].set(
                    row[:, 0, 0].astype(cache.lat_pages.dtype),
                    unique_indices=True)
            new_cache = PagedLatentKVCache(pages, cache.block_tables)
            # qcat is [B, S=1, H, C]; the kernel wants [B, H, 1, C]
            o_lat = paged_latent_attention(
                qcat.transpose(0, 2, 1, 3), pages, cache.block_tables,
                pos_b + 1, r, cfg.attn_scale)     # [B, H, 1, r] f32
            out = jnp.einsum("bhsc,chd->bshd", o_lat,
                             self.w_v_absorb[...],
                             preferred_element_type=jnp.float32)
            out = out.astype(x.dtype).reshape(B, S, H * dv)
            return self.o_proj(out), new_cache
        from .llama import _ChunkedCausal, _grouped_attention_chunked

        if isinstance(cache, Quant4LatentKVCache):
            # packed int4 latent: per-PART affine pairs fold into scores
            # (s_p*(q_p.c'_p) + off_p*sum(q_p) per part) and the output
            # ((p*s_v).c'_v + (p.off_v) broadcast over r)
            cv, crot, sv, ov, sr, orr = _lat4_quant(row, r)
            lat_v = _update_rows(cache.codes_v, cv, cache_pos)
            lat_r = _update_rows(cache.codes_rot, crot, cache_pos)
            sv_a = _update_rows(cache.scale_v, sv, cache_pos)
            ov_a = _update_rows(cache.off_v, ov, cache_pos)
            sr_a = _update_rows(cache.scale_r, sr, cache_pos)
            or_a = _update_rows(cache.off_r, orr, cache_pos)
            new_cache = Quant4LatentKVCache(lat_v, lat_r, sv_a, ov_a,
                                            sr_a, or_a)
            cvu = _lat4_unpack(lat_v[:, 0]).astype(x.dtype)   # [B,T,r]
            cru = _lat4_unpack(lat_r[:, 0]).astype(x.dtype)   # [B,T,dr]
            sv0, sv1 = sv_a[:, 0, :, 0], sv_a[:, 0, :, 1]     # [B,T]
            ov0, ov1 = ov_a[:, 0, :, 0], ov_a[:, 0, :, 1]
            srt, ort = sr_a[:, 0], or_a[:, 0]
            h = r // 2
            if isinstance(mask, _ChunkedCausal):
                # long prefill: dequantize once (a [B, T, C] transient —
                # ~18 MB bf16 at 16k/B=1) and ride the standard chunked
                # online softmax
                latf = jnp.concatenate(
                    [cvu[..., :h].astype(jnp.float32) * sv0[..., None]
                     + ov0[..., None],
                     cvu[..., h:].astype(jnp.float32) * sv1[..., None]
                     + ov1[..., None],
                     cru.astype(jnp.float32) * srt[..., None]
                     + ort[..., None]], -1).astype(x.dtype)
                C = latf.shape[-1]
                qs = (qcat * (cfg.attn_scale * float(C) ** 0.5)
                      ).transpose(0, 2, 1, 3)
                o_lat = _grouped_attention_chunked(
                    qs, latf[:, None], latf[:, None, :, :r],
                    mask.q_pos, C).astype(jnp.float32)
            else:
                qr_ = qcat[..., r:]
                parts = [(qcat[..., :h], cvu[..., :h], sv0, ov0),
                         (qcat[..., h:r], cvu[..., h:], sv1, ov1),
                         (qr_, cru, srt, ort)]
                sq = 0.0
                for qp, cp, sp, op in parts:
                    d = jnp.einsum("bshc,btc->bhst", qp, cp,
                                   preferred_element_type=jnp.float32)
                    qs_ = jnp.sum(qp.astype(jnp.float32),
                                  axis=-1).transpose(0, 2, 1)
                    sq = (sq + d * sp[:, None, None, :]
                          + qs_[..., None] * op[:, None, None, :])
                sq = sq * cfg.attn_scale
                sq = jnp.where(mask, sq, -1e30)
                pq = jax.nn.softmax(sq, axis=-1)
                halves = []
                for cp, sp, op in ((cvu[..., :h], sv0, ov0),
                                   (cvu[..., h:], sv1, ov1)):
                    o_h = jnp.einsum(
                        "bhst,btc->bhsc",
                        (pq * sp[:, None, None, :]).astype(x.dtype), cp,
                        preferred_element_type=jnp.float32)
                    o_h = o_h + jnp.einsum("bhst,bt->bhs", pq,
                                           op)[..., None]
                    halves.append(o_h)
                o_lat = jnp.concatenate(halves, axis=-1)
            out = jnp.einsum("bhsc,chd->bshd", o_lat,
                             self.w_v_absorb[...],
                             preferred_element_type=jnp.float32)
            out = out.astype(x.dtype).reshape(B, S, H * dv)
            return self.o_proj(out), new_cache

        if isinstance(cache, QuantLatentKVCache):
            # per-token quantized latent: scale folds into scores AND
            # probs (one code row is both K and V)
            codes, scl = _kv_quant(row, fmt=cache.fmt)
            lat_c = _update_rows(cache.codes, codes, cache_pos)
            lat_s = _update_rows(cache.scale, scl, cache_pos)
            new_cache = QuantLatentKVCache(lat_c, lat_s)
            if isinstance(mask, _ChunkedCausal):
                C = lat_c.shape[-1]
                qs = (qcat * (cfg.attn_scale * float(C) ** 0.5)
                      ).transpose(0, 2, 1, 3)
                o_lat = _grouped_attention_chunked(
                    qs, lat_c.astype(x.dtype), lat_c[..., :r].astype(
                        x.dtype), mask.q_pos, C,
                    k_scale=lat_s, v_scale=lat_s).astype(jnp.float32)
            else:
                latf = lat_c[:, 0].astype(x.dtype)            # [B,T,C]
                st = lat_s[:, 0]                              # [B,T]
                sq = jnp.einsum("bshc,btc->bhst", qcat, latf,
                                preferred_element_type=jnp.float32)
                sq = sq * st[:, None, None, :] * cfg.attn_scale
                sq = jnp.where(mask, sq, -1e30)
                pq = jax.nn.softmax(sq, axis=-1)
                o_lat = jnp.einsum(
                    "bhst,btc->bhsc",
                    (pq * st[:, None, None, :]).astype(latf.dtype),
                    latf[..., :r], preferred_element_type=jnp.float32)
            out = jnp.einsum("bhsc,chd->bshd", o_lat,
                             self.w_v_absorb[...],
                             preferred_element_type=jnp.float32)
            out = out.astype(x.dtype).reshape(B, S, H * dv)
            return self.o_proj(out), new_cache

        lat = _update_rows(cache.lat, row, cache_pos)         # [B,1,T,r+dr]
        latf = lat[:, 0].astype(x.dtype)                      # [B,T,r+dr]
        if isinstance(mask, _ChunkedCausal):
            # long MLA prefill: latent rides as an Hkv=1 cache through
            # the chunked online softmax. The chunked fn scales scores
            # by 1/sqrt(C); pre-scale q so the effective scale is
            # cfg.attn_scale (MLA's mscale-corrected value).
            C = latf.shape[-1]
            qs = (qcat * (cfg.attn_scale * float(C) ** 0.5)
                  ).transpose(0, 2, 1, 3)                     # [B,H,S,C]
            o_lat = _grouped_attention_chunked(
                qs, latf[:, None], latf[:, None, :, :r],
                mask.q_pos, C).astype(jnp.float32)            # [B,H,S,r]
            out = jnp.einsum("bhsc,chd->bshd", o_lat,
                             self.w_v_absorb[...],
                             preferred_element_type=jnp.float32)
            out = out.astype(x.dtype).reshape(B, S, H * dv)
            return self.o_proj(out), LatentKVCache(lat)
        s = jnp.einsum("bshc,btc->bhst", qcat, latf,
                       preferred_element_type=jnp.float32)
        s = s * cfg.attn_scale
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o_lat = jnp.einsum("bhst,btc->bhsc", p.astype(latf.dtype),
                           latf[..., :r], preferred_element_type=jnp.float32)
        out = jnp.einsum("bhsc,chd->bshd", o_lat,
                         self.w_v_absorb[...],
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(B, S, H * dv)
        return self.o_proj(out), LatentKVCache(lat)


def enable_mla_latent_cache(model: "DeepseekForCausalLM") -> int:
    """Switch a deepseek model to the latent KV cache (absorbed MLA).

    Precomputes each attention's absorbed kv_b factors — dequantizing
    kv_b_proj if a quantization pass replaced it, so the latent path
    reproduces the QUANTIZED expanded numerics — and makes
    ``init_caches`` (hence the generation loops) allocate
    ``LatentKVCache`` rows of r+dr floats/token instead of per-head K/V.
    Returns the number of attention modules converted."""
    n = 0
    for layer in model.model.layers:
        attn = layer.self_attn
        kvb = attn.kv_b_proj
        if getattr(kvb, "pre_scale", None) is not None:
            raise ValueError(
                "kv_b_proj carries a runtime pre_scale (unabsorbed AWQ "
                "smoothing) — the latent absorption would drop it; "
                "quantize with an absorbable config or skip this module")
        if hasattr(kvb, "dequantized_kernel"):
            kernel = kvb.dequantized_kernel(jnp.float32)
        else:
            kernel = kvb.kernel[...].astype(jnp.float32)
        cfg = attn.cfg
        dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
        # keep the absorbed factors in f32: they are tiny (r*H*(dn+dv))
        # and a bf16 cast would re-round the dequantized values on top of
        # the intentional weight quantization
        kbr = kernel.reshape(cfg.kv_lora_rank, cfg.num_attention_heads,
                             dn + dv)
        attn.w_k_absorb = nnx.Param(kbr[..., :dn])
        attn.w_v_absorb = nnx.Param(kbr[..., dn:])
        n += 1
    model.use_latent_cache = True
    return n


class DeepseekDecoderLayer(nnx.Module):
    def __init__(self, cfg: DeepseekConfig, layer_idx: int, rngs: nnx.Rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       cfg.dtype)
        self.self_attn = DeepseekAttention(cfg, rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size,
                                                cfg.rms_norm_eps, cfg.dtype)
        if layer_idx >= cfg.first_k_dense_replace:
            self.mlp = DeepseekMoE(cfg, rngs)
        else:
            self.mlp = DeepseekMLP(cfg, cfg.intermediate_size, rngs)

    def __call__(self, x, cos, sin, mask, cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin,
                                      mask, cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class DeepseekModel(nnx.Module):
    def __init__(self, cfg: DeepseekConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                      dtype=cfg.dtype, param_dtype=cfg.dtype,
                                      rngs=rngs)
        self.layers = nnx.List(
            [DeepseekDecoderLayer(cfg, i, rngs)
             for i in range(cfg.num_hidden_layers)])
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.dtype)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        cfg = self.cfg
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.embed_tokens(input_ids)
        cos, sin = _rope(positions, cfg.qk_rope_head_dim, cfg.rope_theta,
                         1.0, cfg.rope_scaling,
                         cfg.max_position_embeddings)
        from .llama import _ChunkedCausal, _DENSE_MASK_ELEMS

        if caches is None:
            if S * S > _DENSE_MASK_ELEMS:  # long prefill: chunked path
                mask = _ChunkedCausal(jnp.arange(S)[None])
            else:
                mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            if S * T > _DENSE_MASK_ELEMS and S > 1:
                mask = _ChunkedCausal(positions)
            else:
                key_pos = jnp.arange(T)[None, None, None, :]
                mask = key_pos <= positions[:, None, :, None]
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache = caches[i] if caches is not None else None
            x, nc = layer(x, cos, sin, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        return self.norm(x), new_caches


class DeepseekForCausalLM(nnx.Module):
    def __init__(self, cfg: DeepseekConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.model = DeepseekModel(cfg, rngs)
        self.lm_head = nnx.Linear(cfg.hidden_size, cfg.vocab_size,
                                  use_bias=False, dtype=cfg.dtype,
                                  param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        x, new_caches = self.model(input_ids, positions, caches, cache_pos)
        logits = self.lm_head(x)
        if caches is None:
            return logits
        return logits, new_caches

    def init_caches(self, batch: int, max_len: int,
                    quantized: bool | str = False):
        """MLA caches: K rows are qk_head_dim wide, V rows v_head_dim —
        the generation loops call this instead of the llama-shaped
        ``init_kv_cache`` (generation/generate.py _alloc_caches)."""
        cfg = self.cfg
        if getattr(self, "use_latent_cache", False):
            C = cfg.kv_lora_rank + cfg.qk_rope_head_dim
            if quantized:
                fmt = "int8" if quantized is True else str(quantized)
                if fmt == "int4":
                    r = cfg.kv_lora_rank
                    dr = cfg.qk_rope_head_dim
                    return [Quant4LatentKVCache(
                        jnp.zeros((batch, 1, max_len, r // 2), jnp.uint8),
                        jnp.zeros((batch, 1, max_len, dr // 2),
                                  jnp.uint8),
                        jnp.ones((batch, 1, max_len, 2), jnp.float32),
                        jnp.zeros((batch, 1, max_len, 2), jnp.float32),
                        jnp.ones((batch, 1, max_len), jnp.float32),
                        jnp.zeros((batch, 1, max_len), jnp.float32))
                        for _ in range(cfg.num_hidden_layers)]
                cdt = _KV_CODE_DTYPES[fmt]
                return [QuantLatentKVCache(
                    jnp.zeros((batch, 1, max_len, C), cdt),
                    jnp.ones((batch, 1, max_len), jnp.float32))
                    for _ in range(cfg.num_hidden_layers)]
            return [LatentKVCache(jnp.zeros((batch, 1, max_len, C),
                                            cfg.dtype))
                    for _ in range(cfg.num_hidden_layers)]
        H = cfg.num_attention_heads
        kshape = (batch, H, max_len, cfg.qk_head_dim)
        vshape = (batch, H, max_len, cfg.v_head_dim)
        if quantized:
            fmt = "int8" if quantized is True else str(quantized)
            assert fmt != "int4", "packed int4 KV is llama-cache only"
            cdt = _KV_CODE_DTYPES[fmt]
            return [QuantKVCache(jnp.zeros(kshape, cdt),
                                 jnp.ones(kshape[:-1], jnp.float32),
                                 jnp.zeros(vshape, cdt),
                                 jnp.ones(vshape[:-1], jnp.float32))
                    for _ in range(cfg.num_hidden_layers)]
        return [KVCache(jnp.zeros(kshape, cfg.dtype),
                        jnp.zeros(vshape, cfg.dtype))
                for _ in range(cfg.num_hidden_layers)]

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(DEEPSEEK_PRESETS[name])
        params.update(overrides)
        return cls(DeepseekConfig(**params), nnx.Rngs(seed))
