"""OPT family causal LM (NNX) — covers the reference's opt-1.3b/6.7b
recipes (docs/source/llm_recipes.md:153-176, BASELINE config #2).

Architecture: learned positions (offset by 2, HF quirk), pre-LN decoder,
ReLU MLP, separate q/k/v/out projections with biases. Same KV-cache decode
protocol as the rest of the zoo."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from .sdpa import sdpa
from .llama import KVCache, _update_rows, update_cache


@dataclasses.dataclass
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2048
    ffn_dim: int = 8192
    num_hidden_layers: int = 24
    num_attention_heads: int = 32
    max_position_embeddings: int = 2048
    dtype: object = jnp.bfloat16

    @property
    def num_key_value_heads(self):
        return self.num_attention_heads

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


OPT_PRESETS = {
    "opt-test": dict(vocab_size=256, hidden_size=64, ffn_dim=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=64),
    "opt-1.3b": dict(hidden_size=2048, ffn_dim=8192, num_hidden_layers=24,
                     num_attention_heads=32),
    "opt-6.7b": dict(hidden_size=4096, ffn_dim=16384, num_hidden_layers=32,
                     num_attention_heads=32),
}


class OPTAttention(nnx.Module):
    def __init__(self, cfg: OPTConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        lin = lambda: nnx.Linear(cfg.hidden_size, cfg.hidden_size,
                                 dtype=cfg.dtype, param_dtype=cfg.dtype,
                                 rngs=rngs)
        self.q_proj = lin()
        self.k_proj = lin()
        self.v_proj = lin()
        self.out_proj = lin()

    def __call__(self, x, mask, cache=None, cache_pos=None):
        cfg = self.cfg
        B, S, E = x.shape
        H, D = cfg.num_attention_heads, cfg.head_dim
        q = self.q_proj(x).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = self.k_proj(x).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = self.v_proj(x).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)
        out = sdpa(q, k, v, mask, module=self, out_dtype=x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
        return self.out_proj(out), new_cache


class OPTDecoderLayer(nnx.Module):
    def __init__(self, cfg: OPTConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(cfg.hidden_size, dtype=cfg.dtype,
                                   param_dtype=jnp.float32, rngs=rngs)
        self.self_attn_layer_norm = ln()
        self.self_attn = OPTAttention(cfg, rngs)
        self.final_layer_norm = ln()
        self.fc1 = nnx.Linear(cfg.hidden_size, cfg.ffn_dim, dtype=cfg.dtype,
                              param_dtype=cfg.dtype, rngs=rngs)
        self.fc2 = nnx.Linear(cfg.ffn_dim, cfg.hidden_size, dtype=cfg.dtype,
                              param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x, mask, cache=None, cache_pos=None):
        h, new_cache = self.self_attn(self.self_attn_layer_norm(x), mask,
                                      cache, cache_pos)
        x = x + h
        x = x + self.fc2(nnx.relu(self.fc1(self.final_layer_norm(x))))
        return x, new_cache


class OPTForCausalLM(nnx.Module):
    def __init__(self, cfg: OPTConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                      dtype=cfg.dtype, param_dtype=cfg.dtype,
                                      rngs=rngs)
        # HF OPT: learned positions with a +2 offset
        self.embed_positions = nnx.Embed(
            cfg.max_position_embeddings + 2, cfg.hidden_size,
            dtype=cfg.dtype, param_dtype=cfg.dtype, rngs=rngs)
        self.layers = nnx.List(
            [OPTDecoderLayer(cfg, rngs) for _ in range(cfg.num_hidden_layers)])
        self.final_layer_norm = nnx.LayerNorm(
            cfg.hidden_size, dtype=cfg.dtype, param_dtype=jnp.float32,
            rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.embed_tokens(input_ids) + self.embed_positions(positions + 2)
        if caches is None:
            mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            key_pos = jnp.arange(T)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache = caches[i] if caches is not None else None
            x, nc = layer(x, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        x = self.final_layer_norm(x)
        logits = self.embed_tokens.attend(x)  # tied head
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(OPT_PRESETS[name])
        params.update(overrides)
        return cls(OPTConfig(**params), nnx.Rngs(seed))
