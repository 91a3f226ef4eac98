"""GPT-2 family causal LM (NNX) — second model family for coverage
(reference recipe families: gpt-j/opt/gpt2, docs/source/llm_recipes.md).
LayerNorm + learned positions + fused-qkv attention + GELU MLP."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    dtype: object = jnp.bfloat16


class GPT2Attention(nnx.Module):
    def __init__(self, cfg: GPT2Config, rngs: nnx.Rngs):
        self.cfg = cfg
        self.c_attn = nnx.Linear(cfg.n_embd, 3 * cfg.n_embd, dtype=cfg.dtype,
                                 param_dtype=cfg.dtype, rngs=rngs)
        self.c_proj = nnx.Linear(cfg.n_embd, cfg.n_embd, dtype=cfg.dtype,
                                 param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x, mask):
        cfg = self.cfg
        B, S, E = x.shape
        H = cfg.n_head
        D = E // H
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)
        scores = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(D)
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhst,bthd->bshd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return self.c_proj(out.reshape(B, S, E))


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

    def __call__(self, x, mask):
        x = x + self.attn(self.ln_1(x), mask)
        x = x + self.mlp(self.ln_2(x))
        return x


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

    def __call__(self, input_ids):
        B, S = input_ids.shape
        pos = jnp.arange(S)[None, :]
        x = self.wte(input_ids) + self.wpe(pos)
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        for block in self.h:
            x = block(x, mask)
        x = self.ln_f(x)
        return self.wte.attend(x)  # tied lm head
