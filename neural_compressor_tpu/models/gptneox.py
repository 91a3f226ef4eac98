"""GPT-NeoX family causal LM (NNX) — parallel residual with TWO LayerNorms,
fused per-head QKV (with bias), and partial-width *rotate-half* rotary
(``rotary_pct``), the combination GPT-J (interleaved rotary, one LN) and
BLOOM (ALiBi) do not exercise. Reference recipe families:
EleutherAI/gpt-neox-20b (docs/source/llm_recipes.md:141) and
databricks/dolly-v2-12b (llm_recipes.md:117); transformers-API coverage
neural_compressor/transformers/models/modeling_auto.py:92. Pythia and
StableLM-base checkpoints share this graph.

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


@dataclasses.dataclass
class GPTNeoXConfig:
    vocab_size: int = 50432
    hidden_size: int = 6144
    num_hidden_layers: int = 44
    num_attention_heads: int = 64
    intermediate_size: int = 24576
    rotary_pct: float = 0.25
    rotary_emb_base: float = 10000.0
    layer_norm_eps: float = 1e-5
    use_parallel_residual: bool = True
    dtype: object = jnp.bfloat16

    @property
    def num_key_value_heads(self):
        return self.num_attention_heads

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_ndims(self):
        return int(self.head_dim * self.rotary_pct)


GPTNEOX_PRESETS = {
    "gptneox-test": dict(vocab_size=256, hidden_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=256),
    "gptneox-test-seq": dict(vocab_size=256, hidden_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             intermediate_size=256,
                             use_parallel_residual=False),
    "gpt-neox-20b": dict(),
    "dolly-v2-12b": dict(vocab_size=50280, hidden_size=5120,
                         num_hidden_layers=36, num_attention_heads=40,
                         intermediate_size=20480),
    "pythia-1b": dict(vocab_size=50304, hidden_size=2048,
                      num_hidden_layers=16, num_attention_heads=8,
                      intermediate_size=8192),
}


def rope_neox_partial(x, positions, rotary_dim, theta=10000.0):
    """NeoX rotary: rotate-half over the FIRST ``rotary_dim`` dims only.

    Unlike GPT-J's interleaved (rotate-every-two) form, NeoX splits the
    rotary slice into two contiguous halves (HF ``rotate_half``); the
    remaining ``D - rotary_dim`` dims pass through unrotated.
    x: [B, S, H, D]; positions: [B, S].
    """
    rd = rotary_dim
    half = rd // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # [B, S, rd/2]
    cos = jnp.cos(ang)[:, :, None, :]  # [B, S, 1, rd/2]
    sin = jnp.sin(ang)[:, :, None, :]
    xr = x[..., :rd].astype(jnp.float32)
    xp = x[..., rd:]
    x1 = xr[..., :half]
    x2 = xr[..., half:]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    rot = jnp.concatenate([r1, r2], axis=-1)
    return jnp.concatenate([rot.astype(x.dtype), xp], axis=-1)


class GPTNeoXAttention(nnx.Module):
    def __init__(self, cfg: GPTNeoXConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.query_key_value = nnx.Linear(
            cfg.hidden_size, 3 * cfg.hidden_size, dtype=cfg.dtype,
            param_dtype=cfg.dtype, rngs=rngs)
        self.dense = nnx.Linear(cfg.hidden_size, cfg.hidden_size,
                                dtype=cfg.dtype, param_dtype=cfg.dtype,
                                rngs=rngs)

    def __call__(self, x, positions, mask, cache: KVCache | None = None,
                 cache_pos=None):
        cfg = self.cfg
        B, S, E = x.shape
        H, D = cfg.num_attention_heads, cfg.head_dim
        # HF neox fuses qkv per head: [..., H, 3, D] (q, k, v thirds of the
        # per-head slice) — same fused layout as bloom.
        qkv = self.query_key_value(x).reshape(B, S, H, 3, D)
        q = qkv[:, :, :, 0]
        k = qkv[:, :, :, 1]
        v = qkv[:, :, :, 2]
        rd = cfg.rotary_ndims
        q = rope_neox_partial(q, positions, rd, cfg.rotary_emb_base)
        k = rope_neox_partial(k, positions, rd, cfg.rotary_emb_base)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        new_cache = None
        if cache is not None:
            k, v, new_cache = update_cache(cache, k, v, cache_pos, x.dtype)

        out = sdpa(q, k, v, mask, module=self, out_dtype=x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
        return self.dense(out), new_cache


class GPTNeoXMLP(nnx.Module):
    def __init__(self, cfg: GPTNeoXConfig, rngs: nnx.Rngs):
        self.dense_h_to_4h = nnx.Linear(cfg.hidden_size, cfg.intermediate_size,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.dtype, rngs=rngs)
        self.dense_4h_to_h = nnx.Linear(cfg.intermediate_size, cfg.hidden_size,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, x):
        return self.dense_4h_to_h(nnx.gelu(self.dense_h_to_4h(x)))


class GPTNeoXBlock(nnx.Module):
    """Parallel residual with separate LNs: x + attn(ln1(x)) + mlp(ln2(x));
    sequential (``use_parallel_residual=False``, pythia-70m style) falls
    back to the gpt2-like two-step form."""

    def __init__(self, cfg: GPTNeoXConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        ln = lambda: nnx.LayerNorm(cfg.hidden_size,
                                   epsilon=cfg.layer_norm_eps,
                                   dtype=cfg.dtype, param_dtype=jnp.float32,
                                   rngs=rngs)
        self.input_layernorm = ln()
        self.attention = GPTNeoXAttention(cfg, rngs)
        self.post_attention_layernorm = ln()
        self.mlp = GPTNeoXMLP(cfg, rngs)

    def __call__(self, x, positions, mask, cache=None, cache_pos=None):
        a, new_cache = self.attention(self.input_layernorm(x), positions,
                                      mask, cache, cache_pos)
        if self.cfg.use_parallel_residual:
            return x + a + self.mlp(self.post_attention_layernorm(x)), \
                new_cache
        x = x + a
        return x + self.mlp(self.post_attention_layernorm(x)), new_cache


class GPTNeoXForCausalLM(nnx.Module):
    def __init__(self, cfg: GPTNeoXConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_in = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                  dtype=cfg.dtype, param_dtype=cfg.dtype,
                                  rngs=rngs)
        self.layers = nnx.List([GPTNeoXBlock(cfg, rngs)
                                for _ in range(cfg.num_hidden_layers)])
        self.final_layer_norm = nnx.LayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, rngs=rngs)
        self.embed_out = nnx.Linear(cfg.hidden_size, cfg.vocab_size,
                                    use_bias=False, dtype=cfg.dtype,
                                    param_dtype=cfg.dtype, rngs=rngs)

    def __call__(self, input_ids, positions=None, caches=None,
                 cache_pos=None):
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        x = self.embed_in(input_ids)
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
        logits = self.embed_out(self.final_layer_norm(x))
        if caches is None:
            return logits
        return logits, new_caches

    @classmethod
    def from_preset(cls, name: str, seed: int = 0, **overrides):
        params = dict(GPTNEOX_PRESETS[name])
        params.update(overrides)
        return cls(GPTNeoXConfig(**params), nnx.Rngs(seed))
