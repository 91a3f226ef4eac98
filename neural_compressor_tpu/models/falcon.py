"""Falcon family causal LM (NNX) — multi-query attention (1 shared KV head),
parallel attention+MLP residual, fused QKV, NeoX-style rotary. Reference
recipe family: tiiuae/falcon-7b (docs/source/llm_recipes.md:249;
transformers-API coverage modeling_auto.py:92).

Protocol-compatible with the llama zoo decode protocol; caches are llama
``KVCache`` pytrees with ``num_key_value_heads`` KV heads (1 for MQA).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from .sdpa import sdpa
from .llama import KVCache, _rope, _update_rows, apply_rope, update_cache


@dataclasses.dataclass
class FalconConfig:
    vocab_size: int = 65024
    hidden_size: int = 4544
    num_hidden_layers: int = 32
    num_attention_heads: int = 71
    num_kv_heads: int = 1  # multi_query=True
    layer_norm_epsilon: float = 1e-5
    rope_theta: float = 10000.0
    parallel_attn: bool = True
    dtype: object = jnp.bfloat16

    @property
    def n_layer(self):
        return self.num_hidden_layers

    @property
    def num_key_value_heads(self):
        return self.num_kv_heads

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


FALCON_PRESETS = {
    "falcon-test": dict(vocab_size=256, hidden_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_kv_heads=1),
    "falcon-7b": dict(),
}


class FalconAttention(nnx.Module):
    """MQA: fused QKV projects H query heads + num_kv shared K/V heads."""

    def __init__(self, cfg: FalconConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        H, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        self.query_key_value = nnx.Linear(
            cfg.hidden_size, (H + 2 * Hkv) * D, use_bias=False,
            dtype=cfg.dtype, param_dtype=cfg.dtype, rngs=rngs)
        self.dense = nnx.Linear(H * D, cfg.hidden_size, use_bias=False,
                                dtype=cfg.dtype, param_dtype=cfg.dtype,
                                rngs=rngs)

    def __call__(self, x, cos, sin, mask, cache: KVCache | None = None,
                 cache_pos=None):
        cfg = self.cfg
        B, S, _ = x.shape
        H, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        qkv = self.query_key_value(x)
        q, k, v = jnp.split(qkv, [H * D, (H + Hkv) * D], axis=-1)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, Hkv, D)
        v = v.reshape(B, S, Hkv, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)

        out = sdpa(q, k, v, mask, module=self, out_dtype=x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        return self.dense(out), new_cache


class FalconMLP(nnx.Module):
    def __init__(self, cfg: FalconConfig, rngs: nnx.Rngs):
        self.dense_h_to_4h = nnx.Linear(cfg.hidden_size, 4 * cfg.hidden_size,
                                        use_bias=False, dtype=cfg.dtype,
                                        param_dtype=cfg.dtype, rngs=rngs)
        self.dense_4h_to_h = nnx.Linear(4 * cfg.hidden_size, cfg.hidden_size,
                                        use_bias=False, dtype=cfg.dtype,
                                        param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x):
        return self.dense_4h_to_h(nnx.gelu(self.dense_h_to_4h(x)))


class FalconDecoderLayer(nnx.Module):
    """falcon-7b layout: ONE input LayerNorm feeding both attn and MLP,
    parallel residual (parallel_attn=True)."""

    def __init__(self, cfg: FalconConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(cfg.hidden_size,
                                   epsilon=cfg.layer_norm_epsilon,
                                   dtype=cfg.dtype, param_dtype=jnp.float32,
                                   rngs=rngs)
        self.cfg = cfg
        self.input_layernorm = ln()
        self.self_attention = FalconAttention(cfg, rngs)
        if not cfg.parallel_attn:
            self.post_attention_layernorm = ln()
        self.mlp = FalconMLP(cfg, rngs)

    def __call__(self, x, cos, sin, mask, cache=None, cache_pos=None):
        h = self.input_layernorm(x)
        a, new_cache = self.self_attention(h, cos, sin, mask, cache,
                                           cache_pos)
        if self.cfg.parallel_attn:
            return x + a + self.mlp(h), new_cache
        x = x + a
        return x + self.mlp(self.post_attention_layernorm(x)), new_cache


class FalconForCausalLM(nnx.Module):
    def __init__(self, cfg: FalconConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.word_embeddings = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                         dtype=cfg.dtype,
                                         param_dtype=cfg.dtype, rngs=rngs)
        self.h = nnx.List([FalconDecoderLayer(cfg, rngs)
                           for _ in range(cfg.num_hidden_layers)])
        self.ln_f = nnx.LayerNorm(cfg.hidden_size,
                                  epsilon=cfg.layer_norm_epsilon,
                                  dtype=cfg.dtype, param_dtype=jnp.float32,
                                  rngs=rngs)
        self.lm_head = nnx.Linear(cfg.hidden_size, cfg.vocab_size,
                                  use_bias=False, dtype=cfg.dtype,
                                  param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.word_embeddings(input_ids)
        cos, sin = _rope(positions, self.cfg.head_dim, self.cfg.rope_theta)
        if caches is None:
            mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            key_pos = jnp.arange(T)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = [] if caches is not None else None
        for i, block in enumerate(self.h):
            cache = caches[i] if caches is not None else None
            x, nc = block(x, cos, sin, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        logits = self.lm_head(self.ln_f(x))
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(FALCON_PRESETS[name])
        params.update(overrides)
        return cls(FalconConfig(**params), nnx.Rngs(seed))
