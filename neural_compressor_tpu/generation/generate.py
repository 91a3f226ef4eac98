"""Generation loops for (quantized) causal LMs.

Parity target: the reference's INT8-aware greedy/beam search
re-implementations (neural_compressor/transformers/generation/
{greedy_search,beam_search}.py). TPU redesign: one jitted program per
(batch, prompt_len, max_new_tokens) — prefill fills the KV cache, then a
``lax.while_loop`` decodes with early exit when every sequence hit EOS.
The reference's cross-rank ``dist.all_reduce`` of the finished flag
(greedy_search.py:195) is unnecessary here: under pjit the loop is SPMD —
every device computes the same finished flag by construction.

Works with any model following the model-zoo cache protocol:
``model(ids, positions=..., caches=..., cache_pos=...) -> (logits, caches)``
and ``init_kv_cache``-style cache allocation.
"""

from __future__ import annotations

import functools
import weakref
from typing import Callable

import jax
import jax.numpy as jnp
from flax import nnx

from ..models.llama import init_kv_cache
from ..quantization.fuse import s4_prepare as _s4_prepare

# jitted-program cache: model (weak) -> {key: (graphdef, go)}. Without
# it every greedy_search/sample/beam/speculative CALL rebuilt a fresh
# @jax.jit closure — a full recompile per call (~15-20 s over the
# remote-compile tunnel: the "6 tok/s generation API" mystery, round 4;
# bench.py and the serving engine never hit it because they build their
# jitted program once and reuse it).
_PROGRAM_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _cached_program(model, key, graphdef, builder):
    """Reuse the jitted program for (model, static-knobs) across calls;
    validated against graphdef equality so structural changes after a
    cached call (quantize / fuse / module swap) rebuild."""
    try:
        per_model = _PROGRAM_CACHE.get(model)
        if per_model is None:
            per_model = {}
            _PROGRAM_CACHE[model] = per_model
    except TypeError:  # un-weakref-able model: no caching
        return builder()
    hit = per_model.get(key)
    if hit is not None and hit[0] == graphdef:
        return hit[1]
    go = builder()
    per_model[key] = (graphdef, go)
    return go


def _split(model):
    graphdef, state = nnx.split(model)

    def bind(state):
        """Merge + one-time ``s4_prepare`` INSIDE the jitted program and
        return a MODULE-bound apply. Keeping the prepared module (rather
        than re-splitting to state and re-merging per step — the old
        pattern) is load-bearing on TPU: after a round-trip through
        nnx.split, XLA sank the hoisted int4-view bitcasts back into the
        decode-loop body and re-materialized them at ~20 GB/s per call
        (~179 ms/tok at 7B, the exact pathology PERF_NOTES "s4_rowpack"
        documents; bench.py and serving/engine.py always used the
        module-bound form)."""
        m = nnx.merge(graphdef, state)
        _s4_prepare(m)

        def apply(ids, positions, caches, cache_pos):
            return m(ids, positions=positions, caches=caches,
                     cache_pos=cache_pos)

        return apply

    return graphdef, state, bind


def _prefill_and_loop(apply, input_ids, caches, max_new_tokens,
                      eos_token_id, next_token_fn, rng):
    B, P = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
    logits, caches = apply(input_ids, positions, caches, 0)
    first, rng0 = next_token_fn(logits[:, -1], rng)

    out0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    out0 = out0.at[:, 0].set(first[:, 0])
    finished0 = (first[:, 0] == eos_token_id) if eos_token_id is not None \
        else jnp.zeros((B,), bool)

    def cond(carry):
        i, _tok, _caches, _out, finished, _rng = carry
        return (i < max_new_tokens) & ~jnp.all(finished)

    def body(carry):
        i, tok, caches, out, finished, rng = carry
        pos = jnp.full((B, 1), P + i - 1, dtype=jnp.int32)
        logits, caches = apply(tok, pos, caches, P + i - 1)
        nxt, rng = next_token_fn(logits[:, -1], rng)
        nxt = jnp.where(finished[:, None], tok, nxt)
        out = jax.lax.dynamic_update_slice(out, nxt, (0, i))
        if eos_token_id is not None:
            finished = finished | (nxt[:, 0] == eos_token_id)
        return i + 1, nxt, caches, out, finished, rng

    _i, _tok, _caches, out, _fin, _rng = jax.lax.while_loop(
        cond, body, (1, first, caches, out0, finished0, rng0))
    return jnp.concatenate([input_ids, out], axis=1)


def _alloc_caches(model, B: int, total: int):
    """KV caches for a decode run: the model's own ``init_caches`` when it
    defines one (e.g. MLA's asymmetric K/V widths, models/deepseek.py),
    else the llama-shaped ``init_kv_cache`` from its cfg. KV quantization
    flags (algorithms/kv_cache.py) apply either way."""
    quantized = (getattr(model, "kv_cache_format", "int8")
                 if getattr(model, "kv_cache_quantized", False) else False)
    init = getattr(model, "init_caches", None)
    if init is not None:
        return init(B, total, quantized=quantized)
    return init_kv_cache(model.cfg, B, total, quantized=quantized)


def greedy_search(model, input_ids, max_new_tokens: int = 32,
                  eos_token_id: int | None = None, max_len: int | None = None):
    """Greedy decoding with a jitted prefill+decode program."""
    def pick(logits, rng):
        return jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32), rng

    return _run(model, input_ids, max_new_tokens, eos_token_id, pick,
                max_len, cache_key=("greedy",))


def sample(model, input_ids, max_new_tokens: int = 32, temperature: float = 1.0,
           top_k: int | None = None, top_p: float | None = None,
           eos_token_id: int | None = None,
           seed: int = 0, max_len: int | None = None):
    """Temperature / top-k / nucleus (top-p) sampling."""
    def pick(logits, rng):
        rng, sub = jax.random.split(rng)
        lg = logits.astype(jnp.float32) / max(temperature, 1e-5)
        srt = None
        if top_k is not None:
            srt = jnp.sort(lg, axis=-1)[:, ::-1]
            kth = srt[:, top_k - 1][:, None]
            lg = jnp.where(lg < kth, -jnp.inf, lg)
            # top-k masking only -inf's entries below the kth threshold,
            # so the masked logits' descending sort is srt with its tail
            # replaced — the nucleus below reuses ONE sort (bit-exact;
            # halved the engine sampler's measured overhead at V=32k)
            srt = jnp.where(srt < kth, -jnp.inf, srt)
        if top_p is not None:
            if srt is None:
                srt = jnp.sort(lg, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(srt, axis=-1)
            csum = jnp.cumsum(probs, axis=-1)
            # smallest logit still inside the nucleus
            keep = csum - probs < top_p
            kth = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                          keepdims=True)
            lg = jnp.where(lg < kth, -jnp.inf, lg)
        nxt = jax.random.categorical(sub, lg, axis=-1)
        return nxt[:, None].astype(jnp.int32), rng

    return _run(model, input_ids, max_new_tokens, eos_token_id, pick,
                max_len, seed=seed,
                cache_key=("sample", temperature, top_k, top_p))


def _run(model, input_ids, max_new_tokens, eos_token_id, next_token_fn,
         max_len, seed: int = 0, cache_key=("greedy",)):
    B, P = input_ids.shape
    total = P + max_new_tokens if max_len is None else max_len
    caches = _alloc_caches(model, B, total)
    graphdef, state, bind = _split(model)

    def build():
        @functools.partial(jax.jit, static_argnames=("mnt",))
        def go(state, input_ids, caches, rng, mnt):
            apply = bind(state)
            return _prefill_and_loop(apply, input_ids, caches, mnt,
                                     eos_token_id, next_token_fn, rng)

        return go

    go = _cached_program(model, ("run",) + tuple(cache_key)
                         + (eos_token_id,), graphdef, build)
    return go(state, input_ids, caches, jax.random.PRNGKey(seed),
              max_new_tokens)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def beam_search(model, input_ids, num_beams: int = 4,
                max_new_tokens: int = 32, eos_token_id: int | None = None,
                length_penalty: float = 1.0):
    """Beam search with per-beam KV caches (gathered on reorder).

    Simplified vs HF (no early-stopping heuristics): beams end at EOS or
    max_new_tokens; returns the highest-scoring beam per batch element.
    """
    B, P = input_ids.shape
    total = P + max_new_tokens
    # prefill runs over B rows once; the cache is replicated per beam after
    caches = _alloc_caches(model, B, total)
    graphdef, state, bind = _split(model)

    @functools.partial(jax.jit, static_argnames=("mnt", "nb"))
    def _beam_go(state, input_ids, caches, mnt, nb):
        apply = bind(state)
        B, P = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
        logits, caches = apply(input_ids, positions, caches, 0)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        # first step: top-nb continuations of the single prefill beam
        scores, token = jax.lax.top_k(logp, nb)  # [B, nb]
        token = token.astype(jnp.int32)
        # replicate the prefill cache across beams: flat row b*nb+j <- b
        caches = jax.tree.map(lambda x: jnp.repeat(x, nb, axis=0), caches)

        out0 = jnp.zeros((B, nb, mnt), jnp.int32)
        out0 = out0.at[:, :, 0].set(token)
        fin0 = (token == eos_token_id) if eos_token_id is not None else \
            jnp.zeros((B, nb), bool)
        lens0 = jnp.ones((B, nb), jnp.int32)  # generated length per beam

        def gather_caches(caches, beam_src):
            flatsrc = (jnp.arange(B)[:, None] * nb + beam_src).reshape(-1)

            def g(x):
                return x[flatsrc]

            return jax.tree.map(g, caches)

        def cond(carry):
            i, fin = carry[0], carry[5]
            return (i < mnt) & ~jnp.all(fin)

        def body(carry):
            i, token, caches, out, scores, fin, lens = carry
            tok_flat = token.reshape(B * nb, 1)
            pos = jnp.full((B * nb, 1), P + i - 1, dtype=jnp.int32)
            logits, caches = apply(tok_flat, pos, caches, P + i - 1)
            logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32),
                                      axis=-1).reshape(B, nb, V)
            # finished beams only extend with EOS at zero cost
            if eos_token_id is not None:
                eos_only = jnp.full((V,), -jnp.inf).at[eos_token_id].set(0.0)
                logp = jnp.where(fin[:, :, None], eos_only[None, None, :],
                                 logp)
            cand = scores[:, :, None] + logp  # [B, nb, V]
            flat = cand.reshape(B, nb * V)
            scores, idx = jax.lax.top_k(flat, nb)
            beam_src = idx // V
            token = (idx % V).astype(jnp.int32)
            caches = gather_caches(caches, beam_src)
            out = jnp.take_along_axis(out, beam_src[:, :, None], axis=1)
            out = jax.lax.dynamic_update_slice(
                out, token[:, :, None], (0, 0, i))
            fin = jnp.take_along_axis(fin, beam_src, axis=1)
            lens = jnp.take_along_axis(lens, beam_src, axis=1)
            # beams still alive before this step grew by one token
            lens = jnp.where(fin, lens, i + 1)
            if eos_token_id is not None:
                fin = fin | (token == eos_token_id)
            return i + 1, token, caches, out, scores, fin, lens

        _i, _t, _c, out, scores, _f, lens = jax.lax.while_loop(
            cond, body, (1, token, caches, out0, scores, fin0, lens0))
        # HF parity: each hypothesis scored as sum_logprob / len^penalty
        best = jnp.argmax(
            scores / (lens.astype(jnp.float32) ** length_penalty), axis=-1)
        best_out = jnp.take_along_axis(
            out, best[:, None, None], axis=1)[:, 0]
        return jnp.concatenate([input_ids, best_out], axis=1)

    go = _cached_program(model, ("beam", eos_token_id, length_penalty),
                         graphdef, lambda: _beam_go)
    return go(state, input_ids, caches, max_new_tokens, num_beams)


def generate(model, input_ids, do_sample: bool = False, num_beams: int = 1,
             **kwargs):
    """HF-style dispatcher."""
    if num_beams > 1:
        kwargs.pop("temperature", None)
        kwargs.pop("top_k", None)
        kwargs.pop("top_p", None)
        kwargs.pop("seed", None)
        return beam_search(model, input_ids, num_beams=num_beams, **kwargs)
    if do_sample:
        return sample(model, input_ids, **kwargs)
    kwargs.pop("temperature", None)
    kwargs.pop("top_k", None)
    kwargs.pop("top_p", None)
    kwargs.pop("seed", None)
    return greedy_search(model, input_ids, **kwargs)


def greedy_search_mllm(model, input_ids, pixel_values,
                       max_new_tokens: int = 32,
                       eos_token_id: int | None = None,
                       max_len: int | None = None):
    """Greedy decoding for multimodal (llava-style) models: ONE jitted
    program prefills [image, prompt] into the language model's KV caches
    then decodes with positions offset by the image token count. Returns
    [B, P + max_new_tokens] (prompt + generated text ids)."""
    graphdef, state = nnx.split(model)
    n_img = model.num_image_tokens
    B, P = input_ids.shape
    T = max_len or (n_img + P + max_new_tokens)
    assert n_img + P + max_new_tokens <= T, "max_len too small"

    @jax.jit
    def _mllm_run(state, ids, pix):
        m = nnx.merge(graphdef, state)
        _s4_prepare(m)
        caches = init_kv_cache(m.cfg.text, B, T)
        logits, caches = m(ids, pix, caches=caches, cache_pos=0)
        first = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
        out0 = jnp.zeros((B, max_new_tokens), jnp.int32).at[:, 0].set(
            first[:, 0])
        fin0 = ((first[:, 0] == eos_token_id) if eos_token_id is not None
                else jnp.zeros((B,), bool))

        def cond(carry):
            i, _tok, _caches, _out, fin = carry
            return (i < max_new_tokens) & ~jnp.all(fin)

        def body(carry):
            i, tok, caches, out, fin = carry
            pos = n_img + P + i - 1
            logits, caches = m(tok, None,
                               positions=jnp.full((B, 1), pos, jnp.int32),
                               caches=caches, cache_pos=pos)
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            nxt = jnp.where(fin[:, None], tok, nxt)
            out = jax.lax.dynamic_update_slice(out, nxt, (0, i))
            if eos_token_id is not None:
                fin = fin | (nxt[:, 0] == eos_token_id)
            return i + 1, nxt, caches, out, fin

        _i, _t, _c, out, _f = jax.lax.while_loop(
            cond, body, (1, first, caches, out0, fin0))
        return jnp.concatenate([ids, out], axis=1)

    run = _cached_program(
        model, ("mllm", eos_token_id, max_new_tokens, T, B, P),
        graphdef, lambda: _mllm_run)
    return run(state, jnp.asarray(input_ids, jnp.int32), pixel_values)
