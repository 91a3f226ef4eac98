"""GPT-J family causal LM (NNX) — parallel attention+MLP residual and
partial-width interleaved rotary embeddings (the structures llama does not
exercise). Reference recipe family: EleutherAI/gpt-j-6b
(docs/source/llm_recipes.md:129; transformers-API coverage
neural_compressor/transformers/models/modeling_auto.py:92).

Protocol-compatible with the llama zoo: ``model(ids, positions=...,
caches=..., cache_pos=...)``; caches are llama ``KVCache`` pytrees.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from .sdpa import sdpa
from .llama import KVCache, _update_rows, update_cache


@dataclasses.dataclass
class GPTJConfig:
    vocab_size: int = 50400
    n_positions: int = 2048
    n_embd: int = 4096
    n_layer: int = 28
    n_head: int = 16
    rotary_dim: int = 64
    layer_norm_epsilon: float = 1e-5
    n_inner: int | None = None  # default 4*n_embd
    dtype: object = jnp.bfloat16

    # llama-protocol compat
    @property
    def num_hidden_layers(self):
        return self.n_layer

    @property
    def num_key_value_heads(self):
        return self.n_head

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


GPTJ_PRESETS = {
    "gptj-test": dict(vocab_size=256, n_embd=128, n_layer=2, n_head=4,
                      rotary_dim=16, n_positions=128),
    "gptj-6b": dict(),
}


def _rope_interleaved(x, positions, rotary_dim, theta=10000.0):
    """GPT-J rotary: rotate-every-two on the first ``rotary_dim`` dims.

    x: [B, S, H, D]; positions: [B, S].
    """
    B, S, H, D = x.shape
    rd = rotary_dim
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # [B, S, rd/2]
    cos = jnp.cos(ang)[:, :, None, :]  # [B, S, 1, rd/2]
    sin = jnp.sin(ang)[:, :, None, :]
    xr = x[..., :rd].astype(jnp.float32)
    xp = x[..., rd:]
    x1 = xr[..., 0::2]
    x2 = xr[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    rot = jnp.stack([r1, r2], axis=-1).reshape(B, S, H, rd)
    return jnp.concatenate([rot.astype(x.dtype), xp], axis=-1)


class GPTJAttention(nnx.Module):
    def __init__(self, cfg: GPTJConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        lin = lambda i, o: nnx.Linear(i, o, use_bias=False, dtype=cfg.dtype,
                                      param_dtype=cfg.dtype, rngs=rngs)
        self.q_proj = lin(cfg.n_embd, cfg.n_embd)
        self.k_proj = lin(cfg.n_embd, cfg.n_embd)
        self.v_proj = lin(cfg.n_embd, cfg.n_embd)
        self.out_proj = lin(cfg.n_embd, cfg.n_embd)

    def __call__(self, x, positions, mask, cache: KVCache | None = None,
                 cache_pos=None):
        cfg = self.cfg
        B, S, E = x.shape
        H, D = cfg.n_head, cfg.head_dim
        q = self.q_proj(x).reshape(B, S, H, D)
        k = self.k_proj(x).reshape(B, S, H, D)
        v = self.v_proj(x).reshape(B, S, H, D)
        q = _rope_interleaved(q, positions, cfg.rotary_dim)
        k = _rope_interleaved(k, positions, cfg.rotary_dim)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)

        out = sdpa(q, k, v, mask, module=self, out_dtype=x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
        return self.out_proj(out), new_cache


class GPTJMLP(nnx.Module):
    def __init__(self, cfg: GPTJConfig, rngs: nnx.Rngs):
        inner = cfg.n_inner or 4 * cfg.n_embd
        self.fc_in = nnx.Linear(cfg.n_embd, inner, dtype=cfg.dtype,
                                param_dtype=cfg.dtype, rngs=rngs)
        self.fc_out = nnx.Linear(inner, cfg.n_embd, dtype=cfg.dtype,
                                 param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x):
        return self.fc_out(nnx.gelu(self.fc_in(x)))


class GPTJBlock(nnx.Module):
    """Parallel residual: x + attn(ln(x)) + mlp(ln(x)) with ONE LayerNorm."""

    def __init__(self, cfg: GPTJConfig, rngs: nnx.Rngs):
        self.ln_1 = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon,
                                  dtype=cfg.dtype, param_dtype=jnp.float32,
                                  rngs=rngs)
        self.attn = GPTJAttention(cfg, rngs)
        self.mlp = GPTJMLP(cfg, rngs)

    def __call__(self, x, positions, mask, cache=None, cache_pos=None):
        h = self.ln_1(x)
        a, new_cache = self.attn(h, positions, mask, cache, cache_pos)
        return x + a + self.mlp(h), new_cache


class GPTJForCausalLM(nnx.Module):
    def __init__(self, cfg: GPTJConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.wte = nnx.Embed(cfg.vocab_size, cfg.n_embd, dtype=cfg.dtype,
                             param_dtype=cfg.dtype, rngs=rngs)
        self.h = nnx.List([GPTJBlock(cfg, rngs) for _ in range(cfg.n_layer)])
        self.ln_f = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon,
                                  dtype=cfg.dtype, param_dtype=jnp.float32,
                                  rngs=rngs)
        self.lm_head = nnx.Linear(cfg.n_embd, cfg.vocab_size, use_bias=True,
                                  dtype=cfg.dtype, param_dtype=cfg.dtype,
                                  rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.wte(input_ids)
        if caches is None:
            mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            key_pos = jnp.arange(T)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = [] if caches is not None else None
        for i, block in enumerate(self.h):
            cache = caches[i] if caches is not None else None
            x, nc = block(x, positions, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        logits = self.lm_head(self.ln_f(x))
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(GPTJ_PRESETS[name])
        params.update(overrides)
        return cls(GPTJConfig(**params), nnx.Rngs(seed))
