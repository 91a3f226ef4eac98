"""Mixtral-style MoE causal LM (NNX).

Gives the quantization passes a MoE target — the reference quantizes MoE
blocks via ``PatchedMixtralMoE``/``PatchedGaudiMixtralSparseMoeBlock``
(fp8_quant/_quant_common/helper_modules.py:655-1103); here expert MLPs are
ordinary Linear stacks, so RTN/GPTQ/FP8/... quantize them with zero extra
machinery (paths ``...block_sparse_moe.experts.N.w1`` etc.).

Routing: top-k softmax gate. Compute: every expert runs and results are
combined with the (sparse) routing weights — the dense-dispatch formulation
is XLA-friendly (static shapes, no gather/scatter) and exact; capacity-
based EP dispatch over a mesh axis is an optimization planned with
multi-chip MoE serving.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import (
    KVCache,
    LlamaAttention,
    LlamaConfig,
    RMSNorm,
    _rope,
)


@dataclasses.dataclass
class MixtralConfig(LlamaConfig):
    num_local_experts: int = 8
    num_experts_per_tok: int = 2


MIXTRAL_PRESETS = {
    "mixtral-test": dict(vocab_size=256, hidden_size=128,
                         intermediate_size=256, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, num_local_experts=4,
                         num_experts_per_tok=2),
    "mixtral-8x7b": dict(hidden_size=4096, intermediate_size=14336,
                         num_hidden_layers=32, num_attention_heads=32,
                         num_key_value_heads=8, num_local_experts=8,
                         num_experts_per_tok=2, rope_theta=1e6),
}


class MixtralExpert(nnx.Module):
    """w1 (gate), w3 (up), w2 (down) — HF mixtral naming."""

    def __init__(self, cfg: MixtralConfig, rngs: nnx.Rngs):
        lin = lambda i, o: nnx.Linear(i, o, use_bias=False, dtype=cfg.dtype,
                                      param_dtype=cfg.dtype, rngs=rngs)
        self.w1 = lin(cfg.hidden_size, cfg.intermediate_size)
        self.w3 = lin(cfg.hidden_size, cfg.intermediate_size)
        self.w2 = lin(cfg.intermediate_size, cfg.hidden_size)

    def __call__(self, x):
        return self.w2(nnx.silu(self.w1(x)) * self.w3(x))


class MixtralSparseMoeBlock(nnx.Module):
    def __init__(self, cfg: MixtralConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.gate = nnx.Linear(cfg.hidden_size, cfg.num_local_experts,
                               use_bias=False, dtype=cfg.dtype,
                               param_dtype=cfg.dtype, rngs=rngs)
        self.experts = nnx.List(
            [MixtralExpert(cfg, rngs) for _ in range(cfg.num_local_experts)])

    def __call__(self, x):
        cfg = self.cfg
        logits = self.gate(x).astype(jnp.float32)  # [B, S, E]
        topv, topi = jax.lax.top_k(logits, cfg.num_experts_per_tok)
        weights = jax.nn.softmax(topv, axis=-1)  # [B, S, k]
        # dense dispatch: per-expert weight = sum over selected slots
        E = cfg.num_local_experts
        onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [B, S, k, E]
        w_full = jnp.einsum("bske,bsk->bse", onehot, weights)  # [B, S, E]
        out = jnp.zeros_like(x, dtype=jnp.float32)
        for e, expert in enumerate(self.experts):
            out = out + expert(x).astype(jnp.float32) * w_full[..., e:e + 1]
        return out.astype(x.dtype)


class MixtralDecoderLayer(nnx.Module):
    def __init__(self, cfg: MixtralConfig, rngs: nnx.Rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       cfg.dtype)
        self.self_attn = LlamaAttention(cfg, rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size,
                                                cfg.rms_norm_eps, cfg.dtype)
        self.block_sparse_moe = MixtralSparseMoeBlock(cfg, rngs)

    def __call__(self, x, cos, sin, mask, cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin,
                                      mask, cache, cache_pos)
        x = x + h
        x = x + self.block_sparse_moe(self.post_attention_layernorm(x))
        return x, new_cache


class MixtralForCausalLM(nnx.Module):
    def __init__(self, cfg: MixtralConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                      dtype=cfg.dtype, param_dtype=cfg.dtype,
                                      rngs=rngs)
        self.layers = nnx.List(
            [MixtralDecoderLayer(cfg, rngs)
             for _ in range(cfg.num_hidden_layers)])
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.dtype)
        self.lm_head = nnx.Linear(cfg.hidden_size, cfg.vocab_size,
                                  use_bias=False, dtype=cfg.dtype,
                                  param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        cfg = self.cfg
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.embed_tokens(input_ids)
        cos, sin = _rope(positions, cfg.head_dim, cfg.rope_theta)
        if caches is None:
            mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            key_pos = jnp.arange(T)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache = caches[i] if caches is not None else None
            x, nc = layer(x, cos, sin, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        x = self.norm(x)
        logits = self.lm_head(x)
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(MIXTRAL_PRESETS[name])
        params.update(overrides)
        return cls(MixtralConfig(**params), nnx.Rngs(seed))
