"""Mixtral-style MoE causal LM (NNX).

Gives the quantization passes a MoE target — the reference quantizes MoE
blocks via ``PatchedMixtralMoE``/``PatchedGaudiMixtralSparseMoeBlock``
(fp8_quant/_quant_common/helper_modules.py:655-1103); here expert MLPs are
ordinary Linear stacks, so RTN/GPTQ/FP8/... quantize them with zero extra
machinery (paths ``...block_sparse_moe.experts.N.w1`` etc.).

Routing: top-k softmax gate. Two dispatch forms:
  * dense (MixtralSparseMoeBlock): every expert runs on every token,
    combined with sparse routing weights — exact, gather-free, and the
    form all quantization passes see (experts are plain Linears).
  * sparse capacity-based (StackedMoEBlock, via
    ``stack_experts_for_serving``): GShard-style top-k dispatch into
    per-expert capacity slots over STACKED [E, ...] kernels; the expert
    axis shards over the mesh "model" axis = expert parallelism.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
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


class StackedMoEBlock(nnx.Module):
    """Sparse capacity-based MoE dispatch over STACKED expert weights —
    the serving form of ``MixtralSparseMoeBlock``.

    The dense per-expert loop computes every expert on every token; this
    block routes each token to its top-k experts' capacity slots
    (C = ceil(T·k/E · capacity_factor), GShard/Switch-style, overflow
    dropped) and runs the expert FFNs as batched einsums over an [E, ...]
    leading axis. That axis is what EXPERT PARALLELISM shards: under the
    TP mesh the stacked kernels get a P("model", ...) spec so each device
    holds E/tp experts and XLA inserts the dispatch/combine collectives
    (the reference delegates this to deepspeed/vLLM EP modules,
    fp8_quant helper_modules.py:360-560).

    Quantized experts stack their PACKED int4 codes + scales; dequant
    happens inside the batched einsum (XLA fuses it), so expert weights
    keep the 4x memory saving.
    """

    def __init__(self, gate, stacked: dict, cfg: MixtralConfig,
                 quantized: bool, meta: dict | None = None,
                 capacity_factor: float = 2.0, router_protocol: bool = False,
                 shared=None):
        self.cfg = cfg
        self.capacity_factor = capacity_factor
        self.gate = gate
        self.quantized = quantized
        self.meta = meta or {}
        # router_protocol: ``gate`` routes itself — callable(xt [T,H]) ->
        # (topk_indices [T,k], topk_weights [T,k] f32), e.g. deepseek's
        # bias-corrected sigmoid router; else gate is a plain logits
        # Linear and routing is top-k softmax (mixtral)
        self.router_protocol = router_protocol
        # always-on shared experts added to the routed output (deepseek)
        self.shared = shared
        for name, arr in stacked.items():
            setattr(self, name, nnx.Param(arr))

    def _expert_kernels(self):
        """[E, H, I], [E, H, I], [E, I, H] kernels (dequantized to the
        model dtype — an f32 model must not lose bits to a bf16 temp)."""
        if not self.quantized:
            return self.w1s[...], self.w3s[...], self.w2s[...]
        from ..ops.packing import PackedWeight, dequantize_packed

        out_dt = self.cfg.dtype

        def deq(packed, scales, shape):
            def one(p, s):
                pw = PackedWeight(p, s, None, self.meta["bits"],
                                  self.meta["group_size"], "int", shape,
                                  "tpu_strided")
                return dequantize_packed(pw, out_dtype=out_dt)

            return jax.vmap(one)(packed, scales)

        H, I = self.cfg.hidden_size, self.cfg.intermediate_size
        return (deq(self.w1s[...], self.w1s_scales[...], (H, I)),
                deq(self.w3s[...], self.w3s_scales[...], (H, I)),
                deq(self.w2s[...], self.w2s_scales[...], (I, H)))

    def __call__(self, x):
        cfg = self.cfg
        B, S, Hdim = x.shape
        T = B * S
        E = cfg.num_local_experts
        k = cfg.num_experts_per_tok
        xt = x.reshape(T, Hdim)
        if self.router_protocol:
            topi, gates = self.gate(xt)                      # [T, k] each
        else:
            logits = self.gate(xt).astype(jnp.float32)       # [T, E]
            topv, topi = jax.lax.top_k(logits, k)
            gates = jax.nn.softmax(topv, axis=-1)            # [T, k]

        C = int(np.ceil(T * k / E * self.capacity_factor))
        C = max(8, ((C + 7) // 8) * 8)                       # sublane pad
        # GShard-style position-in-expert with priority to earlier tokens
        disp = jnp.zeros((T, E, C), jnp.float32)
        comb = jnp.zeros((T, E, C), jnp.float32)
        counts = jnp.zeros((E,), jnp.int32)
        for j in range(k):
            mask = jax.nn.one_hot(topi[:, j], E, dtype=jnp.int32)  # [T, E]
            pos = counts[None, :] + jnp.cumsum(mask, axis=0) - mask
            counts = counts + jnp.sum(mask, axis=0)
            keep = (pos < C) & (mask == 1)
            # scatter: token t -> (expert topi[t,j], slot pos[t, e])
            pos_t = jnp.sum(pos * mask, axis=1)              # [T]
            keep_t = jnp.any(keep, axis=1)
            oh_slot = jax.nn.one_hot(pos_t, C, dtype=jnp.float32)
            d_j = (mask.astype(jnp.float32)[:, :, None]
                   * oh_slot[:, None, :]
                   * keep_t.astype(jnp.float32)[:, None, None])
            disp = disp + d_j
            comb = comb + d_j * gates[:, j][:, None, None]

        w1, w3, w2 = self._expert_kernels()
        xin = jnp.einsum("tec,th->ech", disp, xt.astype(jnp.float32)
                         ).astype(x.dtype)                   # [E, C, H]
        h = (nnx.silu(jnp.einsum("ech,ehi->eci", xin, w1,
                                 preferred_element_type=jnp.float32))
             * jnp.einsum("ech,ehi->eci", xin, w3,
                          preferred_element_type=jnp.float32))
        out_e = jnp.einsum("eci,eih->ech", h.astype(x.dtype), w2,
                           preferred_element_type=jnp.float32)  # [E, C, H]
        y = jnp.einsum("tec,ech->th", comb, out_e)
        y = y.astype(x.dtype).reshape(B, S, Hdim)
        if self.shared is not None:
            y = y + self.shared(x)
        return y


def stack_experts_for_serving(model, capacity_factor: float = 2.0) -> int:
    """Replace every MoE block with a StackedMoEBlock (sparse capacity
    dispatch + EP-shardable [E, ...] kernels). Covers mixtral's softmax
    top-k blocks (expert legs w1/w3/w2) and deepseek's sigmoid-routed
    blocks (gate/up/down_proj legs; the bias-corrected router and shared
    experts carry over — reference PatchedGaudiDeepseekV3MoE /
    PatchedVllmMixtureOfExpertsOp, helper_modules.py:815,910). Experts
    must be uniform: all fp Linear, or all symmetric int-packed
    WOQLinear."""
    from ..layers.module_utils import named_modules, replace_module
    from ..layers.woq_linear import WOQLinear
    from .deepseek import DeepseekMoE

    n = 0
    for path, mod in list(named_modules(model)):
        if isinstance(mod, MixtralSparseMoeBlock):
            legs = ("w1", "w3", "w2")
            scfg = mod.cfg
            router_protocol, shared = False, None
        elif isinstance(mod, DeepseekMoE):
            legs = ("gate_proj", "up_proj", "down_proj")
            c = mod.cfg
            # the stack stores its shapes in a MixtralConfig record (the
            # dispatch math is identical; only the routing differs)
            scfg = MixtralConfig(
                hidden_size=c.hidden_size,
                intermediate_size=c.moe_intermediate_size,
                num_local_experts=c.n_routed_experts,
                num_experts_per_tok=c.num_experts_per_tok, dtype=c.dtype)
            router_protocol, shared = True, mod.shared_experts
        else:
            continue
        experts = list(mod.experts)
        if all(type(getattr(e, a)) is nnx.Linear
               for e in experts for a in legs):
            stacked = {
                f"w{i}s": jnp.stack([getattr(e, a).kernel[...]
                                     for e in experts])
                for i, a in zip((1, 3, 2), legs)}
        elif all(type(getattr(e, a)) is WOQLinear
                 and getattr(e, a).zeros is None
                 and getattr(e, a).perm is None
                 and getattr(e, a).layout == "tpu_strided"
                 for e in experts for a in legs):
            stacked = {"packed": True}
            for i, a in zip((1, 3, 2), legs):
                stacked[f"w{i}s"] = jnp.stack(
                    [getattr(e, a).packed[...] for e in experts])
                stacked[f"w{i}s_scales"] = jnp.stack(
                    [getattr(e, a).scales[...] for e in experts])
            ref = getattr(experts[0], legs[0])
            stacked["_meta"] = {"bits": ref.bits,
                                "group_size": ref.group_size}
        else:
            continue
        meta = stacked.pop("_meta", None)
        is_packed = stacked.pop("packed", False)
        new = StackedMoEBlock(mod.gate, stacked, scfg, quantized=is_packed,
                              meta=meta, capacity_factor=capacity_factor,
                              router_protocol=router_protocol, shared=shared)
        replace_module(model, path, new)
        n += 1
    return n


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
        from .llama import _ChunkedCausal, _DENSE_MASK_ELEMS

        if caches is None:
            if S * S > _DENSE_MASK_ELEMS:  # long prefill: chunked path
                mask = _ChunkedCausal(jnp.arange(S)[None])
            else:
                mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        else:
            T = caches[0][0].shape[2]
            if S * T > _DENSE_MASK_ELEMS and S > 1:
                mask = _ChunkedCausal(positions)
            else:
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
