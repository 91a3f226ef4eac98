"""GPT-2 family causal LM (NNX) — second model family for coverage
(reference recipe families: gpt-j/opt/gpt2, docs/source/llm_recipes.md).
LayerNorm + learned positions + fused-qkv attention + GELU MLP. Supports
the same static-shape KV-cache decode protocol as the llama zoo
(``model(ids, positions=..., caches=..., cache_pos=...)``)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from .llama import KVCache, _update_rows, update_cache
from .sdpa import sdpa


@dataclasses.dataclass
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    dtype: object = jnp.bfloat16

    # llama-protocol compat (generation / serving helpers)
    @property
    def num_hidden_layers(self):
        return self.n_layer

    @property
    def num_key_value_heads(self):
        return self.n_head

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


class GPT2Attention(nnx.Module):
    def __init__(self, cfg: GPT2Config, rngs: nnx.Rngs):
        self.cfg = cfg
        self.c_attn = nnx.Linear(cfg.n_embd, 3 * cfg.n_embd, dtype=cfg.dtype,
                                 param_dtype=cfg.dtype, rngs=rngs)
        self.c_proj = nnx.Linear(cfg.n_embd, cfg.n_embd, dtype=cfg.dtype,
                                 param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x, mask, cache: KVCache | None = None,
                 cache_pos=None):
        cfg = self.cfg
        B, S, E = x.shape
        H = cfg.n_head
        D = E // H
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # head-major [B, H, S, D]
        q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)

        out = sdpa(q, k, v, mask, module=self, out_dtype=x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
        return self.c_proj(out), new_cache


class GPT2MLP(nnx.Module):
    def __init__(self, cfg: GPT2Config, rngs: nnx.Rngs):
        self.c_fc = nnx.Linear(cfg.n_embd, 4 * cfg.n_embd, dtype=cfg.dtype,
                               param_dtype=cfg.dtype, rngs=rngs)
        self.c_proj = nnx.Linear(4 * cfg.n_embd, cfg.n_embd, dtype=cfg.dtype,
                                 param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x):
        return self.c_proj(nnx.gelu(self.c_fc(x)))


class GPT2Block(nnx.Module):
    def __init__(self, cfg: GPT2Config, rngs: nnx.Rngs):
        self.ln_1 = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon,
                                  dtype=cfg.dtype, param_dtype=jnp.float32,
                                  rngs=rngs)
        self.attn = GPT2Attention(cfg, rngs)
        self.ln_2 = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon,
                                  dtype=cfg.dtype, param_dtype=jnp.float32,
                                  rngs=rngs)
        self.mlp = GPT2MLP(cfg, rngs)

    def __call__(self, x, mask, cache=None, cache_pos=None):
        h, new_cache = self.attn(self.ln_1(x), mask, cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.ln_2(x))
        return x, new_cache


class GPT2LMHeadModel(nnx.Module):
    def __init__(self, cfg: GPT2Config, rngs: nnx.Rngs):
        self.cfg = cfg
        self.wte = nnx.Embed(cfg.vocab_size, cfg.n_embd, dtype=cfg.dtype,
                             param_dtype=cfg.dtype, rngs=rngs)
        self.wpe = nnx.Embed(cfg.n_positions, cfg.n_embd, dtype=cfg.dtype,
                             param_dtype=cfg.dtype, rngs=rngs)
        self.h = nnx.List([GPT2Block(cfg, rngs) for _ in range(cfg.n_layer)])
        self.ln_f = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon,
                                  dtype=cfg.dtype, param_dtype=jnp.float32,
                                  rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.wte(input_ids) + self.wpe(positions)
        if caches is None:
            mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            key_pos = jnp.arange(T)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = [] if caches is not None else None
        for i, block in enumerate(self.h):
            cache = caches[i] if caches is not None else None
            x, nc = block(x, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        x = self.ln_f(x)
        logits = self.wte.attend(x)  # tied lm head
        if caches is None:
            return logits
        return logits, new_caches
