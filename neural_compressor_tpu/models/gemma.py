"""Gemma family causal LM (NNX, TPU-first) — gemma-1 / gemma-2 / gemma-3
(text). The reference's JAX frontend ships a Gemma quantization test
(reference test/jax/test_gemma3.py) and the torch transformers API routes
google/gemma checkpoints (transformers/models/modeling_auto.py); this is
the TPU-native family for those recipes.

Architecture deltas vs the llama stack (verified against HF
modeling_gemma2.py / modeling_gemma3.py):
  * RMSNorm scales by ``(1 + w)`` with the whole norm in f32
  * embeddings multiplied by ``sqrt(hidden_size)``
  * GeGLU MLP: ``down(gelu_tanh(gate(x)) * up(x))``
  * attention scaling is ``query_pre_attn_scalar ** -0.5`` (decoupled
    from head_dim), with optional logit softcapping (gemma-2) and
    per-layer sliding-window attention (layer_types)
  * gemma-2 adds POST-norms: ``x + post_attn_norm(attn(pre_norm(x)))``
    and the same sandwich around the MLP
  * gemma-3 adds per-head-dim QK-norms and a second, local-theta rope
    for the sliding layers; softcapping is gone
  * lm_head is tied to the embedding; final logits optionally softcapped

All projections are plain ``nnx.Linear`` named as in HF (q/k/v/o_proj,
gate/up/down_proj) so every quantization pass swaps them unchanged;
caches reuse the llama ``KVCache``/``QuantKVCache`` protocol
(``generation.greedy_search`` works as-is; tanh softcapping is monotonic
so greedy tokens are unaffected by the final cap).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import _rope, apply_rope, init_kv_cache, update_cache  # noqa: F401


@dataclasses.dataclass
class GemmaConfig:
    vocab_size: int = 256000
    hidden_size: int = 2048
    intermediate_size: int = 16384
    num_hidden_layers: int = 18
    num_attention_heads: int = 8
    num_key_value_heads: int = 1
    head_dim: int = 256
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # gemma-3: sliding layers rotate with this theta instead (HF
    # rope_local_base_freq); None = one shared table (gemma-1/2)
    rope_local_theta: float | None = None
    # rope scaling for the GLOBAL layers only (gemma-3 4b+: linear x8)
    rope_scaling: dict | None = None
    # attention scale is qpas**-0.5 (HF Gemma2Attention.scaling); None
    # defaults to head_dim (the gemma-1 behavior)
    query_pre_attn_scalar: float | None = None
    attn_logit_softcapping: float | None = None
    final_logit_softcapping: float | None = None
    sliding_window: int | None = None
    # per-layer "sliding_attention" | "full_attention"; None = all full
    # (gemma-1). HF writes this list into config.json for gemma-2/3.
    layer_types: tuple | None = None
    # gemma-2/3 post_attention/pre+post_feedforward norm sandwich
    use_post_norms: bool = True
    # gemma-3 per-head-dim q/k RMSNorms
    use_qk_norm: bool = False
    attention_bias: bool = False
    # gemma always ties lm_head to the embedding
    tie_word_embeddings: bool = True
    dtype: object = jnp.bfloat16

    def __post_init__(self):
        if self.query_pre_attn_scalar is None:
            self.query_pre_attn_scalar = float(self.head_dim)
        if self.layer_types is None:
            self.layer_types = ("full_attention",) * self.num_hidden_layers
        self.layer_types = tuple(self.layer_types)
        if len(self.layer_types) != self.num_hidden_layers:
            raise ValueError(
                f"layer_types has {len(self.layer_types)} entries for "
                f"{self.num_hidden_layers} layers")
        if any(t == "sliding_attention" for t in self.layer_types) and \
                not self.sliding_window:
            raise ValueError("sliding_attention layers need sliding_window")


GEMMA_PRESETS = {
    # tiny configs for tests — one per generation's feature set
    "gemma-test": dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=1, head_dim=16,
                       max_position_embeddings=128, use_post_norms=False),
    "gemma2-test": dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=4, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=16,
                        max_position_embeddings=128,
                        query_pre_attn_scalar=24.0,
                        attn_logit_softcapping=50.0,
                        final_logit_softcapping=30.0,
                        sliding_window=8,
                        layer_types=("sliding_attention", "full_attention") * 2),
    "gemma3-test": dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=6, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=16,
                        max_position_embeddings=128,
                        rope_theta=1e6, rope_local_theta=10000.0,
                        use_qk_norm=True, sliding_window=8,
                        layer_types=("sliding_attention",) * 5
                        + ("full_attention",)),
    # real shapes (HF config.json values)
    "gemma2-9b": dict(vocab_size=256000, hidden_size=3584,
                      intermediate_size=14336, num_hidden_layers=42,
                      num_attention_heads=16, num_key_value_heads=8,
                      head_dim=256, query_pre_attn_scalar=256.0,
                      attn_logit_softcapping=50.0,
                      final_logit_softcapping=30.0, sliding_window=4096,
                      layer_types=tuple(
                          "sliding_attention" if i % 2 == 0
                          else "full_attention" for i in range(42))),
    "gemma3-4b-text": dict(vocab_size=262208, hidden_size=2560,
                           intermediate_size=10240, num_hidden_layers=34,
                           num_attention_heads=8, num_key_value_heads=4,
                           head_dim=256, query_pre_attn_scalar=256.0,
                           rope_theta=1e6, rope_local_theta=10000.0,
                           rope_scaling=dict(type="linear", factor=8.0),
                           use_qk_norm=True, sliding_window=1024,
                           max_position_embeddings=131072,
                           layer_types=tuple(
                               "full_attention" if (i + 1) % 6 == 0
                               else "sliding_attention" for i in range(34))),
}


class GemmaRMSNorm(nnx.Module):
    """HF Gemma2RMSNorm: f32 throughout, scale = ``1 + w`` (w inits to 0).

    ``weight_offset`` tells the AWQ/SmoothQuant absorb fold that the
    effective multiplier is ``w + 1``: folding 1/s stores
    ``(w + 1)/s - 1`` (algorithms.awq.apply_absorb_fold)."""

    weight_offset = 1.0

    def __init__(self, dim: int, eps: float, dtype=jnp.bfloat16):
        self.weight = nnx.Param(jnp.zeros((dim,), dtype=jnp.float32))
        self.eps = eps
        self.dtype = dtype

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + self.eps)
        return (xn * (1.0 + self.weight[...])).astype(self.dtype)


def _gemma_grouped_attention(q, k, v, mask, scaling: float,
                             softcap: float | None):
    """GQA-grouped SDPA with gemma's decoupled scale and optional logit
    softcapping (``cap * tanh(s / cap)`` BEFORE the mask, matching HF
    eager_attention_forward). Like llama._grouped_attention, repeated K/V
    are never materialized: the rep query heads of each KV head ride the
    lhs free dims of one dot. q [B,H,S,D] vs k/v [B,Hkv,T,D]."""
    B, H, S, D = q.shape
    from .llama import _ChunkedCausal, _grouped_attention_chunked

    if isinstance(mask, _ChunkedCausal):  # long prefill (llama docstring)
        # the chunked fn scales by 1/sqrt(D); pre-fold gemma's decoupled
        # query_pre_attn_scalar scaling into q
        qs = q * (scaling * float(D) ** 0.5)
        return _grouped_attention_chunked(qs, k, v, mask.q_pos, D,
                                          softcap=softcap,
                                          window=mask.window)
    Hkv = k.shape[1]
    rep = H // Hkv
    qg = q.reshape(B, Hkv, rep, S, D)
    s = jnp.einsum("bgrsd,bgtd->bgrst", qg, k,
                   preferred_element_type=jnp.float32) * scaling
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    s = jnp.where(mask[:, :, None], s, -1e30)  # [B,1,1,S,T] broadcast
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bgrst,bgtd->bgrsd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, H, S, D).astype(q.dtype)


class GemmaAttention(nnx.Module):
    def __init__(self, cfg: GemmaConfig, layer_idx: int, rngs: nnx.Rngs):
        H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        self.cfg = cfg
        self.is_sliding = cfg.layer_types[layer_idx] == "sliding_attention"
        lin = lambda i, o: nnx.Linear(
            i, o, use_bias=cfg.attention_bias, dtype=cfg.dtype,
            param_dtype=cfg.dtype, rngs=rngs)
        self.q_proj = lin(cfg.hidden_size, H * D)
        self.k_proj = lin(cfg.hidden_size, Hkv * D)
        self.v_proj = lin(cfg.hidden_size, Hkv * D)
        self.o_proj = lin(H * D, cfg.hidden_size)
        if cfg.use_qk_norm:
            self.q_norm = GemmaRMSNorm(D, cfg.rms_norm_eps, cfg.dtype)
            self.k_norm = GemmaRMSNorm(D, cfg.rms_norm_eps, cfg.dtype)
        else:
            self.q_norm = self.k_norm = nnx.data(None)

    def __call__(self, x, cos, sin, mask, cache=None, cache_pos=None):
        cfg = self.cfg
        B, S, _ = x.shape
        H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        q = self.q_proj(x).reshape(B, S, H, D)
        k = self.k_proj(x).reshape(B, S, Hkv, D)
        v = self.v_proj(x).reshape(B, S, Hkv, D)
        if self.q_norm is not None:  # gemma-3 QK-norm, before rope
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = apply_rope(q, cos, sin, "half")
        k = apply_rope(k, cos, sin, "half")
        q = q.transpose(0, 2, 1, 3)  # head-major, matches cache layout
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        new_cache = None
        scaling = cfg.query_pre_attn_scalar ** -0.5
        from .llama import PagedKVCache
        if isinstance(cache, PagedKVCache):
            # paged decode (engine serving): window/softcap ride the v2
            # paged kernel; gemma's decoupled scaling pre-folds into q
            # (the kernel scales by 1/sqrt(D))
            from ..kernels.paged_attention import paged_decode_attention
            from .llama import _paged_write_row

            assert S == 1, "paged cache is decode-only (engine prefills " \
                           "through the staging cache)"
            pos_b = jnp.broadcast_to(
                jnp.asarray(cache_pos, jnp.int32).reshape(-1), (B,))
            new_cache = _paged_write_row(cache, k, v, pos_b)
            qs = q * jnp.asarray(scaling * float(D) ** 0.5, q.dtype)
            out = paged_decode_attention(
                qs, new_cache, pos_b + 1,
                window=cfg.sliding_window if self.is_sliding else None,
                softcap=cfg.attn_logit_softcapping)
            out = out.astype(x.dtype).transpose(0, 2, 1, 3)
            return self.o_proj(out.reshape(B, S, H * D)), new_cache
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)
        out = _gemma_grouped_attention(q, k, v, mask, scaling,
                                       cfg.attn_logit_softcapping)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        return self.o_proj(out), new_cache


class GemmaMLP(nnx.Module):
    """GeGLU: ``down(gelu_tanh(gate(x)) * up(x))`` (HF hidden_activation
    gelu_pytorch_tanh — jax.nn.gelu(approximate=True) is the same tanh
    polynomial)."""

    def __init__(self, cfg: GemmaConfig, rngs: nnx.Rngs):
        lin = lambda i, o: nnx.Linear(i, o, use_bias=False, dtype=cfg.dtype,
                                      param_dtype=cfg.dtype, rngs=rngs)
        self.gate_proj = lin(cfg.hidden_size, cfg.intermediate_size)
        self.up_proj = lin(cfg.hidden_size, cfg.intermediate_size)
        self.down_proj = lin(cfg.intermediate_size, cfg.hidden_size)

    def __call__(self, x):
        return self.down_proj(
            jax.nn.gelu(self.gate_proj(x), approximate=True)
            * self.up_proj(x))


class GemmaDecoderLayer(nnx.Module):
    """gemma-2/3 norm sandwich (HF Gemma2DecoderLayer.forward):
    ``x + post_attn_norm(attn(input_norm(x)))`` then
    ``x + post_ffw_norm(mlp(pre_ffw_norm(x)))``; gemma-1
    (use_post_norms=False) degenerates to the llama two-norm form."""

    def __init__(self, cfg: GemmaConfig, layer_idx: int, rngs: nnx.Rngs):
        norm = lambda: GemmaRMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                    cfg.dtype)
        self.cfg = cfg
        self.input_layernorm = norm()
        self.self_attn = GemmaAttention(cfg, layer_idx, rngs)
        self.post_attention_layernorm = norm()
        if cfg.use_post_norms:
            self.pre_feedforward_layernorm = norm()
            self.post_feedforward_layernorm = norm()
        else:
            self.pre_feedforward_layernorm = nnx.data(None)
            self.post_feedforward_layernorm = nnx.data(None)
        self.mlp = GemmaMLP(cfg, rngs)

    def __call__(self, x, cos, sin, mask, cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin,
                                      mask, cache, cache_pos)
        if self.cfg.use_post_norms:
            x = x + self.post_attention_layernorm(h)
            x = x + self.post_feedforward_layernorm(
                self.mlp(self.pre_feedforward_layernorm(x)))
        else:  # gemma-1: post_attention_layernorm is the pre-MLP norm
            x = x + h
            x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class GemmaModel(nnx.Module):
    def __init__(self, cfg: GemmaConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                      dtype=cfg.dtype, param_dtype=cfg.dtype,
                                      rngs=rngs)
        self.layers = nnx.List([GemmaDecoderLayer(cfg, i, rngs)
                                for i in range(cfg.num_hidden_layers)])
        self.norm = GemmaRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.dtype)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        cfg = self.cfg
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        # HF scales the embedding by sqrt(hidden) CAST TO THE MODEL DTYPE
        # (Gemma2Model normalizer) — keep the cast so bf16 parity holds
        x = self.embed_tokens(input_ids) * jnp.asarray(
            cfg.hidden_size ** 0.5, cfg.dtype)

        # rope tables: global theta (+ optional linear scaling, gemma-3
        # 4b+), and a local-theta table for the sliding layers (gemma-3)
        cos_g, sin_g = _rope(positions, cfg.head_dim, cfg.rope_theta,
                             1.0, cfg.rope_scaling,
                             cfg.max_position_embeddings)
        if cfg.rope_local_theta is not None:
            cos_l, sin_l = _rope(positions, cfg.head_dim,
                                 cfg.rope_local_theta, 1.0, None,
                                 cfg.max_position_embeddings)
        else:
            cos_l, sin_l = cos_g, sin_g

        # masks [B, 1, S, T]: causal, plus the sliding band
        # (q_pos - k_pos < window, HF create_sliding_window_causal_mask)
        from .llama import _ChunkedCausal, _DENSE_MASK_ELEMS

        T_keys = S if caches is None else caches[0][0].shape[2]
        if S * T_keys > _DENSE_MASK_ELEMS and S > 1:  # long prefill
            mask_full = _ChunkedCausal(positions)
            mask_sliding = (_ChunkedCausal(positions, cfg.sliding_window)
                            if cfg.sliding_window else mask_full)
        else:
            key_pos = jnp.arange(T_keys)[None, None, None, :]
            q_pos = positions[:, None, :, None]
            mask_full = key_pos <= q_pos
            mask_sliding = mask_full
            if cfg.sliding_window:
                mask_sliding = mask_full & (q_pos - key_pos
                                            < cfg.sliding_window)

        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache = caches[i] if caches is not None else None
            # from cfg, not layer.self_attn: calibration may wrap the layer
            sliding = cfg.layer_types[i] == "sliding_attention"
            x, nc = layer(x, cos_l if sliding else cos_g,
                          sin_l if sliding else sin_g,
                          mask_sliding if sliding else mask_full,
                          cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        return self.norm(x), new_caches


class GemmaForCausalLM(nnx.Module):
    def __init__(self, cfg: GemmaConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.model = GemmaModel(cfg, rngs)
        self.lm_head = None  # always tied (HF GemmaForCausalLM)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        x, new_caches = self.model(input_ids, positions, caches, cache_pos)
        logits = self.model.embed_tokens.attend(x)
        cap = self.cfg.final_logit_softcapping
        if cap is not None:
            logits = cap * jnp.tanh(logits / cap)
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(GEMMA_PRESETS[name])
        params.update(overrides)
        return cls(GemmaConfig(**params), nnx.Rngs(seed))
