"""BLOOM family causal LM (NNX) — ALiBi positional biases (no RoPE), fused
per-head QKV, embedding LayerNorm, tied head. Reference recipe family:
bigscience/bloom-1b7 (docs/source/llm_recipes.md:105; transformers-API
coverage modeling_auto.py:92).

Protocol-compatible with the llama zoo decode protocol; caches are llama
``KVCache`` pytrees.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .sdpa import sdpa
from .llama import KVCache, _update_rows, update_cache


@dataclasses.dataclass
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 2048
    n_layer: int = 24
    n_head: int = 16
    layer_norm_epsilon: float = 1e-5
    dtype: object = jnp.bfloat16

    @property
    def num_hidden_layers(self):
        return self.n_layer

    @property
    def num_key_value_heads(self):
        return self.n_head

    @property
    def head_dim(self):
        return self.hidden_size // self.n_head


BLOOM_PRESETS = {
    "bloom-test": dict(vocab_size=256, hidden_size=128, n_layer=2, n_head=4),
    "bloom-1b7": dict(vocab_size=250880, hidden_size=2048, n_layer=24,
                      n_head=16),
}


def alibi_slopes(n_head: int) -> np.ndarray:
    """ALiBi per-head slopes (Press et al.; HF bloom build_alibi_tensor)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_head).is_integer():
        return np.asarray(pow2_slopes(n_head), dtype=np.float32)
    closest = 2 ** math.floor(math.log2(n_head))
    base = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][: n_head - closest]
    return np.asarray(base + extra, dtype=np.float32)


class BloomAttention(nnx.Module):
    def __init__(self, cfg: BloomConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.query_key_value = nnx.Linear(
            cfg.hidden_size, 3 * cfg.hidden_size, dtype=cfg.dtype,
            param_dtype=cfg.dtype, rngs=rngs)
        self.dense = nnx.Linear(cfg.hidden_size, cfg.hidden_size,
                                dtype=cfg.dtype, param_dtype=cfg.dtype,
                                rngs=rngs)
        self.slopes = nnx.Variable(jnp.asarray(alibi_slopes(cfg.n_head)))

    def __call__(self, x, mask, cache: KVCache | None = None,
                 cache_pos=None):
        cfg = self.cfg
        B, S, E = x.shape
        H, D = cfg.n_head, cfg.head_dim
        # HF bloom fuses qkv per head: [..., H, 3, D]
        qkv = self.query_key_value(x).reshape(B, S, H, 3, D)
        q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)

        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)

        T = k.shape[2]
        # ALiBi: bias_j = slope_h * key_pos_j (shift-invariant per softmax
        # row == the -slope*(i-j) distance form of the paper)
        key_pos = jnp.arange(T, dtype=jnp.float32)
        alibi = (self.slopes[...][:, None, None]
                 * key_pos[None, None, :])[None]
        out = sdpa(q, k, v, mask, module=self, bias=alibi, out_dtype=x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
        return self.dense(out), new_cache


class BloomMLP(nnx.Module):
    def __init__(self, cfg: BloomConfig, rngs: nnx.Rngs):
        self.dense_h_to_4h = nnx.Linear(cfg.hidden_size, 4 * cfg.hidden_size,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.dtype, rngs=rngs)
        self.dense_4h_to_h = nnx.Linear(4 * cfg.hidden_size, cfg.hidden_size,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x):
        return self.dense_4h_to_h(nnx.gelu(self.dense_h_to_4h(x)))


class BloomBlock(nnx.Module):
    def __init__(self, cfg: BloomConfig, rngs: nnx.Rngs):
        ln = lambda: nnx.LayerNorm(cfg.hidden_size,
                                   epsilon=cfg.layer_norm_epsilon,
                                   dtype=cfg.dtype, param_dtype=jnp.float32,
                                   rngs=rngs)
        self.input_layernorm = ln()
        self.self_attention = BloomAttention(cfg, rngs)
        self.post_attention_layernorm = ln()
        self.mlp = BloomMLP(cfg, rngs)

    def __call__(self, x, mask, cache=None, cache_pos=None):
        h, new_cache = self.self_attention(self.input_layernorm(x), mask,
                                           cache, cache_pos)
        x = x + h
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, new_cache


class BloomForCausalLM(nnx.Module):
    def __init__(self, cfg: BloomConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.word_embeddings = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                         dtype=cfg.dtype,
                                         param_dtype=cfg.dtype, rngs=rngs)
        self.word_embeddings_layernorm = nnx.LayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_epsilon, dtype=cfg.dtype,
            param_dtype=jnp.float32, rngs=rngs)
        self.h = nnx.List([BloomBlock(cfg, rngs) for _ in range(cfg.n_layer)])
        self.ln_f = nnx.LayerNorm(cfg.hidden_size,
                                  epsilon=cfg.layer_norm_epsilon,
                                  dtype=cfg.dtype, param_dtype=jnp.float32,
                                  rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.word_embeddings_layernorm(self.word_embeddings(input_ids))
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
        logits = self.word_embeddings.attend(x)  # tied head
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(BLOOM_PRESETS[name])
        params.update(overrides)
        return cls(BloomConfig(**params), nnx.Rngs(seed))
