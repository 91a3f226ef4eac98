"""Phi family causal LM (NNX) — microsoft/phi-1, phi-1.5, phi-2. Parallel
attention+MLP residual off a SINGLE LayerNorm (GPT-J style) but with
*rotate-half* partial rotary (``partial_rotary_factor``), biased q/k/v/dense
projections, and a biased lm_head — the dense-layout cousin of GPT-NeoX.
Reference coverage: transformers-API model matrix
(neural_compressor/transformers/models/modeling_auto.py:92; WOQ examples
cover phi-2 in docs/source/validated_model_list.md).

Protocol-compatible with the llama zoo: ``model(ids, positions=...,
caches=..., cache_pos=...)``; caches are llama ``KVCache`` pytrees.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from .sdpa import sdpa
from .llama import KVCache, update_cache
from .gptneox import rope_neox_partial


@dataclasses.dataclass
class PhiConfig:
    vocab_size: int = 51200
    hidden_size: int = 2560
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    intermediate_size: int = 10240
    partial_rotary_factor: float = 0.4
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5
    dtype: object = jnp.bfloat16

    @property
    def num_key_value_heads(self):
        return self.num_attention_heads

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_ndims(self):
        return int(self.head_dim * self.partial_rotary_factor)


PHI_PRESETS = {
    "phi-test": dict(vocab_size=256, hidden_size=128, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=256,
                     partial_rotary_factor=0.5),
    "phi-2": dict(),
    "phi-1_5": dict(hidden_size=2048, num_hidden_layers=24,
                    num_attention_heads=32, intermediate_size=8192,
                    partial_rotary_factor=0.5),
}


class PhiAttention(nnx.Module):
    def __init__(self, cfg: PhiConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        lin = lambda i, o: nnx.Linear(i, o, use_bias=True, dtype=cfg.dtype,
                                      param_dtype=cfg.dtype, rngs=rngs)
        self.q_proj = lin(cfg.hidden_size, cfg.hidden_size)
        self.k_proj = lin(cfg.hidden_size, cfg.hidden_size)
        self.v_proj = lin(cfg.hidden_size, cfg.hidden_size)
        self.dense = lin(cfg.hidden_size, cfg.hidden_size)

    def __call__(self, x, positions, mask, cache: KVCache | None = None,
                 cache_pos=None):
        cfg = self.cfg
        B, S, E = x.shape
        H, D = cfg.num_attention_heads, cfg.head_dim
        q = self.q_proj(x).reshape(B, S, H, D)
        k = self.k_proj(x).reshape(B, S, H, D)
        v = self.v_proj(x).reshape(B, S, H, D)
        rd = cfg.rotary_ndims
        q = rope_neox_partial(q, positions, rd, cfg.rope_theta)
        k = rope_neox_partial(k, positions, rd, cfg.rope_theta)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)

        out = sdpa(q, k, v, mask, module=self, out_dtype=x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
        return self.dense(out), new_cache


class PhiMLP(nnx.Module):
    def __init__(self, cfg: PhiConfig, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(cfg.hidden_size, cfg.intermediate_size,
                              dtype=cfg.dtype, param_dtype=cfg.dtype,
                              rngs=rngs)
        self.fc2 = nnx.Linear(cfg.intermediate_size, cfg.hidden_size,
                              dtype=cfg.dtype, param_dtype=cfg.dtype,
                              rngs=rngs)

    def __call__(self, x):
        return self.fc2(nnx.gelu(self.fc1(x)))


class PhiBlock(nnx.Module):
    """x + attn(ln(x)) + mlp(ln(x)) — one LayerNorm feeding both branches."""

    def __init__(self, cfg: PhiConfig, rngs: nnx.Rngs):
        self.input_layernorm = nnx.LayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, rngs=rngs)
        self.self_attn = PhiAttention(cfg, rngs)
        self.mlp = PhiMLP(cfg, rngs)

    def __call__(self, x, positions, mask, cache=None, cache_pos=None):
        h = self.input_layernorm(x)
        a, new_cache = self.self_attn(h, positions, mask, cache, cache_pos)
        return x + a + self.mlp(h), new_cache


class PhiForCausalLM(nnx.Module):
    def __init__(self, cfg: PhiConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                      dtype=cfg.dtype, param_dtype=cfg.dtype,
                                      rngs=rngs)
        self.layers = nnx.List([PhiBlock(cfg, rngs)
                                for _ in range(cfg.num_hidden_layers)])
        self.final_layernorm = nnx.LayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, rngs=rngs)
        self.lm_head = nnx.Linear(cfg.hidden_size, cfg.vocab_size,
                                  use_bias=True, dtype=cfg.dtype,
                                  param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.embed_tokens(input_ids)
        if caches is None:
            mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            key_pos = jnp.arange(T)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = [] if caches is not None else None
        for i, block in enumerate(self.layers):
            cache = caches[i] if caches is not None else None
            x, nc = block(x, positions, mask, cache, cache_pos)
            if new_caches is not None:
                new_caches.append(nc)
        logits = self.lm_head(self.final_layernorm(x))
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(PHI_PRESETS[name])
        params.update(overrides)
        return cls(PhiConfig(**params), nnx.Rngs(seed))
