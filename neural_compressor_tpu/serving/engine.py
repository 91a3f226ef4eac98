"""Continuous-batching serving engine for (quantized) causal LMs.

The north-star serving loop (BASELINE.json): a fixed pool of decode slots
shares one jitted decode program; requests prefill into a free slot on
arrival and retire independently at EOS/limit, so the batch stays full
without global synchronization. The reference delegates serving to external
stacks (vLLM/Gaudi — e.g. PatchedVLLMKVCache,
neural_compressor/torch/algorithms/fp8_quant/_quant_common/
helper_modules.py:1178); this is our native equivalent, so the request
features vLLM supplies there are owned here:

  * per-request SAMPLING (``do_sample``/``temperature``/``top_k``/
    ``top_p``/``seed``) runs INSIDE the jitted decode/combined programs as
    [B] arrays + per-slot PRNG keys, with the exact numerics of
    :func:`~..generation.generate.sample` — a single engine request with a
    given seed emits the same tokens as a B=1 ``sample()`` call. Greedy
    dispatches keep using the argmax-only programs (zero overhead; the
    sampling variant compiles only when a sampled request is active).
  * per-request STOP conditions: ``max_new_tokens``, extra
    ``stop_token_ids`` (included in the output, like EOS), and multi-token
    ``stop_sequences`` (matched on the host against the generated tail and
    trimmed from the output).
  * STREAMING: ``stream=callback`` is invoked as ``callback(req, token)``
    the moment each token is decided (a multi-token stop may stream up to
    ``len(seq)-1`` tokens that are later trimmed — inherent to streaming).
  * ADMISSION CONTROL + PREEMPTION (paged mode): requests are only
    admitted to a slot when the page pool can hold their prompt, and when
    a decode step would exhaust the pool the engine PREEMPTS the
    latest-arrived slot (frees its pages, requeues the request) instead of
    raising; a preempted request re-prefills prompt+generated on its next
    turn and continues exactly (its PRNG key rides along in the Request).

Design (TPU):
  * one KV cache of [n_slots, H, T, D] per layer; per-slot positions go to
    the fused decode-attention kernel (pos is a [B] array)
  * the decode step is ONE jit call for all slots, every iteration —
    finished/empty slots decode garbage that is simply ignored (masked on
    the host), keeping shapes static; non-decoding slots park their
    garbage cache writes on the last (never-attended) row
  * prefill is CHUNKED and BATCHED: every prefilling prompt advances one
    fixed-size chunk per engine iteration, all of them in ONE jitted
    dispatch (rows gathered/scattered by slot index) — decode of the
    other slots interleaves between chunks, and a burst of long prompts
    prefills concurrently instead of one-at-a-time
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..common import logger
from ..models.llama import init_kv_cache
from ..quantization.fuse import s4_prepare as _s4_prepare


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray            # [P] int32
    max_new_tokens: int = 64
    # sampling (generation/generate.py sample() numerics; False -> greedy)
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int | None = None
    top_p: float | None = None
    seed: int = 0
    # stopping: extra per-request stop TOKENS (kept in the output, like
    # EOS) and multi-token stop SEQUENCES (trimmed from the output)
    stop_token_ids: tuple = ()
    stop_sequences: tuple = ()
    # streaming: called as stream(req, token) per decided token
    stream: Callable | None = None
    # filled during serving
    generated: list = dataclasses.field(default_factory=list)
    # log P(token | prefix) under the model's RAW distribution (no
    # temperature/filtering — the OpenAI-style logprob), one per token
    logprobs: list = dataclasses.field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    prefill_pos: int = 0          # tokens already written to the cache
    preemptions: int = 0
    _key: np.ndarray | None = None  # PRNG state (uint32[2]), advances/token
    # OpenAI-style top-N logprobs: per generated token, a
    # (values, token_ids) pair of the raw distribution's top
    # ``top_logprobs`` entries (requires the engine's ``logprobs_topk``)
    top_logprobs: int = 0
    top_items: list = dataclasses.field(default_factory=list)
    # prefix caching: tokens covered by remapped cached pages, and
    # whether their KV still needs the pool->staging copy
    _prefix_tokens: int = 0
    _prefix_unstaged: bool = False


def _masked_logits(logits, temp, topk, topp):
    """The temperature/top-k/top-p filtering pipeline of ``_sample_step``
    as masked f32 logits over a [B, V] block (categorical-ready)."""
    V = logits.shape[-1]
    lg = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-5)[:, None]
    srt = jnp.sort(lg, axis=-1)[:, ::-1]
    idx = jnp.clip(topk - 1, 0, V - 1)
    kth_k = jnp.take_along_axis(srt, idx[:, None], axis=1)
    kth_k = jnp.where((topk > 0)[:, None], kth_k, -jnp.inf)
    lg = jnp.where(lg < kth_k, -jnp.inf, lg)
    # ONE sort serves both filters: sample() re-sorts the top-k-masked
    # logits for the nucleus, but masking only -inf's entries BELOW the
    # kth threshold, which preserves descending order — the masked sort
    # is exactly ``srt`` with its tail replaced (measured: the second
    # [B, V] sort was half the 10.6% engine sampling overhead at 7B)
    srt2 = jnp.where(srt < kth_k, -jnp.inf, srt)
    probs = jax.nn.softmax(srt2, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep = csum - probs < topp[:, None]
    kth_p = jnp.min(jnp.where(keep, srt2, jnp.inf), axis=-1, keepdims=True)
    kth_p = jnp.where((topp >= 0)[:, None], kth_p, -jnp.inf)
    return jnp.where(lg < kth_p, -jnp.inf, lg)


def _sample_step(logits, keys, temp, topk, topp, dos):
    """Per-row sampling over a [B, V] logit block — the vectorized twin of
    ``generation.generate.sample``'s ``pick`` (generate.py:138): identical
    op sequence (temperature, top-k kth threshold, nucleus threshold on
    the masked logits, categorical), so a B=1 engine request reproduces a
    B=1 ``sample()`` run bit-for-bit given the same key sequence. Rows
    with ``dos``=False take the argmax and leave their key untouched.
    ``topk`` <= 0 and ``topp`` < 0 mean "disabled" (the masking threshold
    collapses to -inf = identity, matching sample()'s skipped branch)."""
    lg = _masked_logits(logits, temp, topk, topp)
    spl = jax.vmap(jax.random.split)(keys)        # [B, 2, 2]
    nk, sub = spl[:, 0], spl[:, 1]
    # row-wise [1, V] categorical == sample()'s batch call at B=1
    drawn = jax.vmap(
        lambda kk, l: jax.random.categorical(kk, l[None, :], axis=-1)[0]
    )(sub, lg)
    nxt = jnp.where(dos, drawn, jnp.argmax(logits, axis=-1)).astype(
        jnp.int32)
    keys = jnp.where(dos[:, None], nk, keys)
    return nxt, keys, _chosen_logprob(logits, nxt)


def _chosen_logprob(logits, nxt):
    """log P(nxt) under the RAW model distribution [B] (serving
    logprobs are reported pre-temperature/filter, OpenAI-style)."""
    lgf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lgf, axis=-1)
    chosen = jnp.take_along_axis(
        lgf, nxt[:, None].astype(jnp.int32), axis=1)[:, 0]
    return chosen - lse


def _top_n_logprobs(logits, n):
    """[B, V] -> (values [B, n], ids [B, n]): the top-n of the RAW
    log-distribution (same normalisation as ``_chosen_logprob`` — the
    OpenAI-style ``top_logprobs`` payload)."""
    lgf = logits.astype(jnp.float32)
    lp = lgf - jax.scipy.special.logsumexp(lgf, axis=-1, keepdims=True)
    return jax.lax.top_k(lp, n)


def _spec_rounds(m_, caches, buf, pos, lim, active, rounds, kk, nn,
                 eos, park, samp=None):
    """``rounds`` prompt-lookup verify rounds over all slots (shared by
    the pure-spec and combined prefill+spec programs). Returns
    (caches, outs [B, rounds, kk+1], ms [B, rounds], keys [B, 2]).

    ``samp`` = (keys, temp, topk, topp, dos) enables per-slot SAMPLED
    verification by rejection sampling (vLLM/spec-decoding's exact
    scheme specialised to a deterministic draft): the n-gram proposal is
    a point mass, so proposal t_j is accepted with probability
    p_j(t_j) under the request's temperature/top-k/top-p distribution,
    and on first rejection the correction token is drawn from the
    residual p_j with t_j removed (renormalised) — the bonus row (all
    accepted) draws from the full p_kk. The emitted sequence is
    distributed EXACTLY as autoregressive sampling from p. Keys advance
    one split per emitted token (same bookkeeping as ``_sample_step``,
    so preemption resume stays exact); each row's accept-uniform and
    correction draw fold that split's subkey with 0/1."""
    W = kk + 1
    B, L = buf.shape
    sampling = samp is not None
    if sampling:
        keys0, temp_s, topk_s, topp_s, dos = samp
    else:
        keys0 = jnp.zeros((B, 2), jnp.uint32)

    def round_body(i, carry):
        pos, buf, caches, outs, ms, keys = carry
        fin = ~active | (pos >= lim)
        posx = jnp.where(fin, park, pos)
        b = posx - 1
        # --- propose: last n-gram match in the slot buffer
        sidx = posx[:, None] - nn + jnp.arange(nn)[None, :]
        suffix = jnp.take_along_axis(
            buf, jnp.clip(sidx, 0, L - 1), axis=1)
        nwin = L - nn + 1
        eq = jnp.ones((B, nwin), bool)
        for j in range(nn):
            eq = eq & (jax.lax.dynamic_slice_in_dim(
                buf, j, nwin, 1) == suffix[:, j:j + 1])
        jidx = jnp.arange(nwin)[None, :]
        validm = eq & (jidx + nn < posx[:, None])
        jbest = jnp.max(jnp.where(validm, jidx, -1), axis=1)
        has = jbest >= 0
        gidx = (jbest + nn)[:, None] + jnp.arange(kk)[None, :]
        cur = jnp.take_along_axis(buf, b[:, None], axis=1)
        prop = jnp.take_along_axis(
            buf, jnp.clip(gidx, 0, L - 1), axis=1)
        prop = jnp.where(has[:, None], prop,
                         jnp.broadcast_to(cur, (B, kk))).astype(jnp.int32)
        # --- verify: one (kk+1)-window forward, per-slot positions
        window = jnp.concatenate([cur, prop], axis=1)
        positions = b[:, None] + jnp.arange(W)[None, :]
        lg, caches = m_(window, positions=positions, caches=caches,
                        cache_pos=b)
        t = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        match = prop == t[:, :kk]
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                    axis=1) + 1
        emit = t
        if sampling:
            V = lg.shape[-1]
            ml = _masked_logits(
                lg.astype(jnp.float32).reshape(B * W, V),
                jnp.repeat(temp_s, W), jnp.repeat(topk_s, W),
                jnp.repeat(topp_s, W)).reshape(B, W, V)

            def kstep(ks, _):
                spl = jax.vmap(jax.random.split)(ks)   # [B, 2, 2]
                return spl[:, 0], (spl[:, 0], spl[:, 1])

            _nk, (states, subs) = jax.lax.scan(kstep, keys, None,
                                               length=W)
            chain = jnp.concatenate([keys[None], states], 0)  # [W+1,B,2]
            ka = jax.vmap(jax.vmap(
                lambda k: jax.random.fold_in(k, 0)))(subs)    # [W, B, 2]
            kb = jax.vmap(jax.vmap(
                lambda k: jax.random.fold_in(k, 1)))(subs)
            u = jax.vmap(jax.vmap(jax.random.uniform))(ka)    # [W, B]
            p = jax.nn.softmax(ml, axis=-1)
            pt = jnp.take_along_axis(
                p[:, :kk], prop[..., None], axis=-1)[..., 0]  # [B, kk]
            acc = u.T[:, :kk] < pt
            macc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1),
                           axis=1)                            # [B] 0..kk
            row_ml = jnp.take_along_axis(
                ml, macc[:, None, None], axis=1)[:, 0]        # [B, V]
            tok_rm = jnp.take_along_axis(
                prop, jnp.clip(macc, 0, kk - 1)[:, None], axis=1)[:, 0]
            bonus = macc == kk
            row_ml = jnp.where(
                (jnp.arange(V)[None, :] == tok_rm[:, None])
                & ~bonus[:, None], -jnp.inf, row_ml)
            kb_row = jnp.take_along_axis(
                kb.transpose(1, 0, 2), macc[:, None, None],
                axis=1)[:, 0]                                 # [B, 2]
            y = jax.vmap(
                lambda k2, l: jax.random.categorical(
                    k2, l[None, :], axis=-1)[0])(kb_row, row_ml)
            prop_w = jnp.concatenate([prop, prop[:, -1:]], axis=1)
            jr = jnp.arange(W)[None, :]
            emit_s = jnp.where(
                jr < macc[:, None], prop_w,
                jnp.where(jr == macc[:, None],
                          y.astype(jnp.int32)[:, None], t))
            emit = jnp.where(dos[:, None], emit_s, t)
            m = jnp.where(dos, macc + 1, m)
        if eos is not None:
            is_eos = emit == eos
            eos_idx = jnp.argmax(is_eos, axis=1)
            has_eos = jnp.any(is_eos, axis=1) & (eos_idx < m)
            m = jnp.where(has_eos, eos_idx + 1, m)
        m = jnp.where(fin, 0, jnp.minimum(m, lim - pos))
        if sampling:
            # key after this round = chain state after m splits (one per
            # emitted token; truncated rows' splits are never consumed)
            newk = jnp.take_along_axis(
                chain.transpose(1, 0, 2),
                jnp.broadcast_to(m[:, None, None], (B, 1, 2)),
                axis=1)[:, 0]
            keys = jnp.where((dos & ~fin)[:, None], newk, keys)

        def row(bf, tw, p_, f):
            st = jnp.minimum(p_, L - W)
            old = jax.lax.dynamic_slice(bf, (st,), (W,))
            return jax.lax.dynamic_update_slice(
                bf, jnp.where(f, old, tw), (st,))

        buf = jax.vmap(row)(buf, emit, posx, fin)
        outs = jax.lax.dynamic_update_index_in_dim(outs, emit, i, axis=1)
        ms = jax.lax.dynamic_update_index_in_dim(ms, m, i, axis=1)
        return pos + m, buf, caches, outs, ms, keys

    outs0 = jnp.zeros((B, rounds, W), jnp.int32)
    ms0 = jnp.zeros((B, rounds), jnp.int32)
    _pos, _buf, caches, outs, ms, keys = jax.lax.fori_loop(
        0, rounds, round_body, (pos, buf, caches, outs0, ms0, keys0))
    return caches, outs, ms, keys


def _next_token_fn(sampling: bool):
    """The decode-loop next-token step: argmax (the measured fast path)
    or the in-program sampler; both also emit the chosen token's raw
    logprob (a logsumexp + gather — trivial next to the weight stream).
    Uniform signature so every engine program threads (keys,
    samp-params) whether or not it uses them — XLA dead-code-eliminates
    the unused operands in the greedy variant."""
    if sampling:
        return _sample_step

    def greedy(logits, keys, temp, topk, topp, dos):
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, keys, _chosen_logprob(logits, nxt)

    return greedy


class ContinuousBatchingEngine:
    """``paged=True`` swaps the per-slot contiguous caches for a shared
    page pool + block tables (kernels/paged_attention): slots only own the
    pages their actual length needs, so ``n_pages`` can be sized well
    below ``n_slots * max_len / page_size`` when typical lengths are
    shorter than the cap (vLLM's memory win, TPU-native). Prefill streams
    through ``prefill_streams`` contiguous staging rows (copied into
    pages on completion), so that many long prompts overlap."""

    def __init__(self, model, n_slots: int = 8, max_len: int = 1024,
                 eos_token_id: int | None = None,
                 prefill_chunk: int = 256, paged: bool = False,
                 n_pages: int | None = None, page_size: int = 128,
                 prefill_streams: int = 2, speculative: str | None = None,
                 spec_k: int = 8, spec_n: int = 2,
                 spec_adaptive: bool = False, spec_min_rate: float = 1.3,
                 prefix_cache: bool = False, logprobs_topk: int = 0):
        self.model = model
        self.cfg = model.cfg
        self.n_slots = n_slots
        self.max_len = max_len
        self.eos_token_id = eos_token_id
        # draft-free prompt-lookup speculation INSIDE the serving loop
        # (speculative="ngram"): each decode round verifies a
        # (spec_k+1)-token window per slot, proposals from the most
        # recent spec_n-gram match in that slot's prompt+generated —
        # measured 3.2x at B=1 on repetitive workloads (PERF_NOTES
        # round 5). Greedy requests verify by argmax match; SAMPLED
        # requests verify by exact rejection sampling (_spec_rounds
        # docstring). Contiguous caches AND paged pools of every format
        # (windowed page kernels).
        if speculative not in (None, "ngram"):
            raise ValueError(f"speculative={speculative!r}: only 'ngram'")
        self.speculative = speculative
        self.spec_k = int(spec_k)
        self.spec_n = int(spec_n)
        # ADAPTIVE speculation (vLLM's dynamic-spec analog): when the
        # EWMA of tokens/round over spec dispatches drops below
        # ``spec_min_rate``, the engine falls back to plain decode for a
        # cooldown of dispatches, then re-probes with one spec dispatch
        # — flat-distribution workloads measured 0.73x UNDER speculation
        # at 7B (PERF_NOTES "SAMPLED speculation"), so paying for
        # windows no one accepts is a real regression, not a wash
        self.spec_adaptive = bool(spec_adaptive)
        self.spec_min_rate = float(spec_min_rate)
        self._spec_ewma: float | None = None
        self._spec_cool = 0
        # per-request top-N logprobs (OpenAI/vLLM ``top_logprobs``):
        # the engine-level cap sizes the programs' extra [B, k, N]
        # outputs; requests ask for n <= cap at submit()
        self._tln = int(logprobs_topk)
        if self._tln and speculative:
            raise ValueError("logprobs_topk is not supported under "
                             "speculative serving (spec rounds emit "
                             "tokens without logprob payloads)")
        # chunk starts step by the chunk size from 0: a chunk that would
        # cross max_len gets its dynamic_update_slice start CLAMPED,
        # silently shifting rows — round down to a divisor of max_len
        c = min(prefill_chunk, max_len)
        while max_len % c:
            c -= 1
        if c != prefill_chunk:
            logger.info("prefill_chunk %d -> %d (must divide max_len %d)",
                        prefill_chunk, c, max_len)
        self.prefill_chunk = c
        quantized = (getattr(model, "kv_cache_format", "int8")
                 if getattr(model, "kv_cache_quantized", False) else False)
        self.paged = paged
        # models may own their cache shapes (deepseek's MLA has
        # asymmetric K/V widths; latent mode has [r+dr] rows) — prefer
        # the model's init_caches over the llama-shaped default, like
        # generation/_alloc_caches does
        self._model_caches = getattr(model, "init_caches", None)
        self.latent = bool(getattr(model, "use_latent_cache", False))
        self._pc = None
        if prefix_cache and not paged:
            raise ValueError("prefix_cache=True requires paged=True "
                             "(prefix reuse is page-granular)")
        if paged:
            from ..models.llama import init_paged_pool

            assert max_len % page_size == 0
            self.page_size = page_size
            self.pmax = max_len // page_size
            # page 0 is the trash page (idle slots park their writes there)
            self.n_pages = n_pages or (n_slots * self.pmax // 2 + 1)
            if self.latent:
                from ..models.deepseek import init_paged_latent_pool

                self.pools = init_paged_latent_pool(
                    self.cfg, self.n_pages, n_slots, max_len,
                    page_size=page_size)
            else:
                assert self._model_caches is None or not hasattr(
                    self.cfg, "kv_lora_rank"), \
                    "paged deepseek serving needs the latent cache " \
                    "(enable_mla_latent_cache)"
                self.pools = init_paged_pool(
                    self.cfg, self.n_pages, n_slots, max_len,
                    page_size=page_size, quantized=quantized)
            self.block_tables = np.zeros((n_slots, self.pmax), np.int32)
            # device-side block table cache: re-uploaded only when the
            # host table mutates (a per-dispatch jnp.asarray costs a
            # host->device transfer per round over the TPU tunnel)
            self._bt_dev = None
            self._bt_dirty = True
            self.free_pages = list(range(self.n_pages - 1, 0, -1))
            self.slot_pages: list[list[int]] = [[] for _ in range(n_slots)]
            # automatic PREFIX CACHING (vLLM's KV-reuse feature, owned
            # natively): full prompt pages are content-hash registered
            # after commit and re-mapped into later requests' block
            # tables; the skipped prefix is dequant-copied page->staging
            # so remainder chunks attend it (serving/prefix_cache.py)
            if prefix_cache:
                from .prefix_cache import PagePrefixCache

                self._pc = PagePrefixCache(page_size)
            else:
                self._pc = None
            # prefill staging: ``prefill_streams`` contiguous cache rows so
            # several long prompts prefill concurrently (one batched chunk
            # dispatch per engine iteration) instead of one-at-a-time
            self.prefill_streams = max(1, min(prefill_streams, n_slots))
            if self._model_caches is not None:
                self.staging = self._model_caches(self.prefill_streams,
                                                  max_len)
            else:
                self.staging = init_kv_cache(self.cfg,
                                             self.prefill_streams,
                                             max_len, quantized=False)
            self._free_staging = list(range(self.prefill_streams - 1, -1, -1))
            self._staging_of: dict[int, int] = {}  # slot -> staging row
            self._cache_rows = max_len
            if speculative:
                if self.latent:
                    raise ValueError("speculative serving has no paged "
                                     "MLA latent support")
                # all pool formats: bf16/int8/fp8/int4 (the windowed
                # write kernels patch int4 nibble windows too)
                self._cache_rows = max_len + self.spec_k + 2
        else:
            # speculative mode writes verify windows up to spec_k rows
            # past the last decided position (and parks idle slots on a
            # window ABOVE max_len) — allocate the margin
            total = (max_len + self.spec_k + 2 if speculative
                     else max_len)
            self._cache_rows = total
            if self._model_caches is not None:
                self.caches = self._model_caches(n_slots, total,
                                                 quantized=quantized)
            else:
                self.caches = init_kv_cache(self.cfg, n_slots, total,
                                            quantized=quantized)
            self.prefill_streams = n_slots
        self._graphdef, self._state = nnx.split(model)
        self._uid = itertools.count()
        # slot bookkeeping (host side)
        self.slot_req: list[Request | None] = [None] * n_slots
        self.slot_state = ["idle"] * n_slots  # idle | prefill | decode
        self.slot_pos = np.zeros((n_slots,), np.int32)   # next write index
        self.slot_tok = np.zeros((n_slots,), np.int32)   # last token
        # per-slot sampling params/PRNG state (mirrors the owning Request)
        self.slot_samp = np.zeros((n_slots,), bool)
        self.slot_temp = np.ones((n_slots,), np.float32)
        self.slot_topk = np.zeros((n_slots,), np.int32)
        self.slot_topp = -np.ones((n_slots,), np.float32)
        self.slot_keys = np.zeros((n_slots, 2), np.uint32)
        self.queue: list[Request] = []
        self._jit_cache: dict = {}
        # observability counters (metrics()/print_metrics())
        self.stats = {"wall_s": 0.0, "requests": 0, "prompt_tokens": 0,
                      "generated_tokens": 0, "prefill_chunk_dispatches": 0,
                      "decode_dispatches": 0, "combined_dispatches": 0,
                      "preemptions": 0, "spec_rounds": 0,
                      "spec_accepted": 0, "prefix_hit_tokens": 0,
                      "spec_suppressed_dispatches": 0}

    # ------------------------------------------------------------------ api
    def submit(self, prompt_ids, max_new_tokens: int = 64,
               do_sample: bool = False, temperature: float = 1.0,
               top_k: int | None = None, top_p: float | None = None,
               seed: int = 0, stop_token_ids=(), stop_sequences=(),
               stream: Callable | None = None,
               top_logprobs: int = 0) -> Request:
        """Queue a request. Sampling knobs match
        :func:`~..generation.generate.sample`; ``stop_token_ids`` are
        additional per-request EOS-like tokens (kept in the output);
        ``stop_sequences`` are token-id tuples trimmed from the output on
        match; ``stream(req, tok)`` fires per decided token."""
        prompt = np.asarray(prompt_ids, np.int32)
        assert prompt.ndim == 1, "submit() takes a single unbatched prompt"
        if top_logprobs > self._tln:
            raise ValueError(
                f"top_logprobs={top_logprobs} exceeds the engine's "
                f"logprobs_topk={self._tln} (set it at construction — "
                "it sizes the programs' top-N outputs)")
        assert len(prompt) + max_new_tokens <= self.max_len, (
            f"prompt ({len(prompt)}) + max_new_tokens ({max_new_tokens}) "
            f"exceeds max_len ({self.max_len})")
        req = Request(next(self._uid), prompt, max_new_tokens,
                      do_sample=do_sample, temperature=float(temperature),
                      top_k=top_k, top_p=top_p, seed=seed,
                      stop_token_ids=tuple(int(t) for t in stop_token_ids),
                      stop_sequences=tuple(
                          tuple(int(t) for t in s) for s in stop_sequences),
                      stream=stream, top_logprobs=int(top_logprobs))
        if do_sample:
            # threefry2x32 seed layout ([hi32, lo32] of the 64-bit
            # seed) computed HOST-side: np.asarray(PRNGKey(seed)) costs
            # a device round trip per submit over the tunnel
            # (equivalence asserted in test_engine_prng_key_host_layout)
            s_ = int(seed)
            if s_ >= 1 << 32:      # x64-off jax truncates wide seeds
                s_ &= 0xFFFFFFFF
            s64 = s_ & 0xFFFFFFFFFFFFFFFF   # sign-extend negatives
            req._key = np.array([s64 >> 32, s64 & 0xFFFFFFFF], np.uint32)
        self.queue.append(req)
        self.stats["requests"] += 1
        self.stats["prompt_tokens"] += len(prompt)
        return req

    def submit_n(self, prompt_ids, n: int, max_new_tokens: int = 64,
                 seed: int = 0, **kw) -> list:
        """vLLM-style ``n`` completions of one prompt: ``n`` requests
        with seeds ``seed..seed+n-1`` (greedy duplicates are pointless —
        sampling is implied unless explicitly disabled). With
        ``prefix_cache=True`` the shared prompt's full pages are reused
        across the siblings after the first commits, so the marginal
        prefill cost of each extra completion is the prompt tail only."""
        kw.setdefault("do_sample", True)
        return [self.submit(prompt_ids, max_new_tokens=max_new_tokens,
                            seed=seed + i, **kw) for i in range(n)]

    def run(self, max_steps: int = 10_000,
            chunk: int = 8) -> list[Request]:
        """Serve until queue and slots drain. ``chunk`` decode steps run
        per device dispatch (amortizes host/link round-trips; slots that
        hit EOS/stop mid-chunk are truncated on the host). Returns
        finished requests."""
        import time as _time

        t0 = _time.time()
        finished = []
        for _ in range(max_steps):
            self._fill_slots()
            if all(s == "idle" for s in self.slot_state) and not self.queue:
                break
            if self.paged:
                # allocate this iteration's decode pages up front —
                # preemption (not RuntimeError) resolves pool pressure,
                # and it must happen BEFORE the decode set is captured
                for slot in range(self.n_slots):
                    if self.slot_state[slot] == "decode":
                        self._ensure_pages(
                            slot, min(int(self.slot_pos[slot]) + chunk,
                                      self.max_len - 1))
            decoding = [s for s in range(self.n_slots)
                        if self.slot_state[s] == "decode"]
            if decoding and self.speculative and self._spec_cool > 0:
                # adaptive cooldown: recent acceptance too low — serve
                # this iteration through the plain decode path
                self._spec_cool -= 1
                self.stats["spec_suppressed_dispatches"] += 1
                self._advance_prefill()
                self.step_many(chunk)
                finished.extend(self._collect())
                continue
            if decoding and self.speculative:
                # speculative serving: prefill chunk + verify rounds in
                # ONE dispatch when both kinds of work exist (contiguous;
                # paged spec runs them as two dispatches — staging and
                # pools are disjoint either way)
                rounds = max(int(chunk), 1)
                work = self._gather_prefill()
                spec_sampling = bool(self.slot_samp[decoding].any())
                if work is None:
                    self._spec_step(rounds)
                elif self.paged or spec_sampling or bool(
                        np.any(work[3][4])):
                    # paged, or any sampling in flight (the combined
                    # program's prefill emission and verify rounds are
                    # argmax-only): prefill and spec as two dispatches
                    self._advance_prefill(work)
                    self._spec_step(rounds)
                else:
                    active, args, ends, _samp = work
                    self.stats["combined_dispatches"] += 1
                    self.stats["prefill_chunk_dispatches"] += 1
                    self.stats["decode_dispatches"] += 1
                    dec, buf, pos, lim, act = self._spec_args()
                    fn = self._combined_spec_fn(args[0].shape[0], rounds)
                    self.caches, nxt, outs, ms = fn(
                        self._state, self.caches, *args,
                        jnp.asarray(buf), jnp.asarray(pos),
                        jnp.asarray(lim), jnp.asarray(act))
                    outs, ms, nxt = jax.device_get((outs, ms, nxt))
                    self._apply_spec(dec, outs, ms, rounds)
                    self._apply_prefill(active, ends, nxt)
                finished.extend(self._collect())
                continue
            if decoding:
                # prefill chunk + k decode steps in ONE dispatch. Paged
                # mode too: prefill writes the staging rows while decode
                # writes the page pools — disjoint buffers, one program.
                work = self._gather_prefill()
                if work is None:
                    self.step_many(chunk)
                elif self._tln:
                    # top-N logprob outputs ride only the split prefill/
                    # decode programs — skip the combined fusion
                    self._advance_prefill(work)
                    self.step_many(chunk)
                else:
                    active, args, ends, psamp = work
                    # combined iterations also count toward the prefill/
                    # decode splits (they subsume one of each)
                    self.stats["combined_dispatches"] += 1
                    self.stats["prefill_chunk_dispatches"] += 1
                    self.stats["decode_dispatches"] += 1
                    toks = jnp.asarray(self.slot_tok)
                    pos = jnp.asarray(self._decode_positions())
                    dsamp = self._decode_samp_args()
                    sampling = bool(np.any(psamp[4])) or bool(
                        self.slot_samp[decoding].any())
                    pdev = tuple(jnp.asarray(a) for a in psamp)
                    if self.paged:
                        fn = self._combined_paged_fn(args[0].shape[0],
                                                     chunk, sampling)
                        (self.pools, self.staging, nxt, out, lps, pkeys,
                         plp, dkeys) = fn(
                            self._state, self.pools, self.staging,
                            self._bt_device(), *args, toks,
                            pos, *pdev, *dsamp)
                    else:
                        fn = self._combined_fn(args[0].shape[0], chunk,
                                               sampling)
                        (self.caches, nxt, out, lps, pkeys, plp,
                         dkeys) = fn(
                            self._state, self.caches, *args, toks, pos,
                            *pdev, *dsamp)
                    # ONE host round trip for the whole dispatch: each
                    # separate np.asarray costs a full tunnel RTT
                    # (~25 ms), device_get of the tuple batches them
                    # (readback_ab.log: 24 vs 126 ms for 5 arrays)
                    out, dkeys, lps, nxt, pkeys, plp = jax.device_get(
                        (out, dkeys, lps, nxt, pkeys, plp))
                    self._apply_decode(out, decoding, chunk, dkeys, lps)
                    self._apply_prefill(active, ends, nxt, pkeys, plp)
            else:
                self._advance_prefill()
            finished.extend(self._collect())
        self.stats["wall_s"] += _time.time() - t0
        return finished

    def cancel(self, req: Request) -> None:
        """Abort a request: queued requests leave the queue immediately;
        running ones stop at the next host sync (their slot, pages, and
        staging row are reclaimed by the serve loop)."""
        req.cancelled = True
        req.done = True
        if req in self.queue:
            self.queue.remove(req)

    def metrics(self) -> dict:
        """Serving observability (reference-style Statistics surface):
        cumulative prompt/generated token counts (in-flight requests
        included), request count, engine dispatch split, preemption
        count, and end-to-end generation throughput over ``run()`` wall
        time. A combined prefill+decode iteration increments
        ``combined_dispatches`` AND both split counters (it subsumes one
        of each), so total device dispatches = prefill + decode -
        combined. NOTE wall_s includes jit compiles on a cold engine and
        prefill time — ``generated_tok_s`` is an END-TO-END number, not a
        pure steady-state decode rate."""
        s = dict(self.stats)
        s["generated_tok_s"] = (s["generated_tokens"] / s["wall_s"]
                                if s["wall_s"] > 0 else 0.0)
        if self._pc is not None:
            s.update(self._pc.stats())
        return s

    def reset_prefix_cache(self) -> None:
        """Forget every cached prefix (weights swapped, cache poisoned,
        or benchmarking): reusable pages return to the allocator; pages
        still referenced by live slots just lose their registration and
        free normally when their slots retire."""
        if self._pc is None:
            return
        while True:
            pid = self._pc.evict_one()
            if pid is None:
                break
            self.free_pages.append(pid)
        self._pc.drop()

    def print_metrics(self) -> None:
        from ..common.utility import Statistics

        m = self.metrics()
        rows = [(k, (f"{v:.2f}" if isinstance(v, float) else v))
                for k, v in sorted(m.items())]
        Statistics(rows, header="Serving Engine Metrics",
                   field_names=["Metric", "Value"]).print_stat()

    # ------------------------------------------------------------- internals
    def _decode_samp_args(self):
        """Device-side per-slot sampling operands for a decode dispatch."""
        return (jnp.asarray(self.slot_keys), jnp.asarray(self.slot_temp),
                jnp.asarray(self.slot_topk), jnp.asarray(self.slot_topp),
                jnp.asarray(self.slot_samp))

    def _prefill_batch_fn(self, n: int, sampling: bool):
        """One jitted chunk program over ``n`` concurrently-prefilling
        rows (padded to a power of two so the compile count stays
        O(log n_slots)): gather the rows' cache slices, run the chunk for
        all of them in one dispatch, scatter back. The completion token
        comes from ``_next_token_fn`` — argmax, or the in-program sampler
        for rows finishing a sampled request (non-final chunks pass
        dos=False so the request key only advances on EMITTED tokens)."""
        key = ("prefill_batch", n, sampling, self._tln)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            C = self.prefill_chunk
            nxt_fn = _next_token_fn(sampling)
            tln = self._tln

            @functools.partial(jax.jit, donate_argnums=(1,))
            def prefill(state, caches, ids, rows, starts, last_idx,
                        keys, temp, topk, topp, dos):
                m = nnx.merge(graphdef, state)
                _s4_prepare(m)
                positions = starts[:, None] + jnp.arange(C)[None, :]
                sub = jax.tree.map(lambda c: c[rows], caches)
                logits, sub = m(ids, positions=positions, caches=sub,
                                cache_pos=starts)
                caches = jax.tree.map(lambda c, s: c.at[rows].set(s),
                                      caches, sub)
                last = logits[jnp.arange(n), last_idx]
                nxt, keys, lp = nxt_fn(last, keys, temp, topk, topp, dos)
                if tln:
                    tv, ti = _top_n_logprobs(last, tln)
                else:
                    tv = jnp.zeros((n, 1), jnp.float32)
                    ti = jnp.zeros((n, 1), jnp.int32)
                return caches, nxt, keys, lp, tv, ti

            self._jit_cache[key] = prefill
        return self._jit_cache[key]

    @staticmethod
    def _prompt_of(req: Request) -> np.ndarray:
        """The token stream a (re-)prefill must write: the prompt plus any
        tokens already generated before a preemption."""
        if req.generated:
            return np.concatenate(
                [req.prompt, np.asarray(req.generated, np.int32)])
        return req.prompt

    def _gather_prefill(self):
        """Collect this iteration's prefill work: (active [(slot, row)],
        padded device args, per-slot chunk ends, sampling arrays) or None
        when no slot is prefilling. Paged mode binds each prefilling slot
        to one of ``prefill_streams`` staging rows for its duration."""
        active: list[tuple[int, int]] = []  # (slot, target row)
        for slot in range(self.n_slots):
            req = self.slot_req[slot]
            if req is None or self.slot_state[slot] != "prefill" \
                    or req.done:  # done = cancelled mid-prefill
                continue
            if self.paged:
                row = self._staging_of.get(slot)
                if row is None:
                    if not self._free_staging:
                        continue  # all streams busy — wait for one to free
                    row = self._free_staging.pop()
                    self._staging_of[slot] = row
                if req._prefix_unstaged:
                    self._stage_prefix(slot, row)
                active.append((slot, row))
            else:
                active.append((slot, slot))
        if not active:
            return None
        C = self.prefill_chunk
        S = len(active)
        Sp = 1 << (S - 1).bit_length()
        ids = np.zeros((Sp, C), np.int32)
        rows = np.zeros((Sp,), np.int32)
        starts = np.zeros((Sp,), np.int32)
        last = np.zeros((Sp,), np.int32)
        keys = np.zeros((Sp, 2), np.uint32)
        temp = np.ones((Sp,), np.float32)
        topk = np.zeros((Sp,), np.int32)
        topp = -np.ones((Sp,), np.float32)
        dos = np.zeros((Sp,), bool)
        ends = []
        for i, (slot, row) in enumerate(active):
            req = self.slot_req[slot]
            src = self._prompt_of(req)
            start = req.prefill_pos
            end = min(start + C, len(src))
            ids[i, : end - start] = src[start:end]
            rows[i], starts[i], last[i] = row, start, end - start - 1
            # only the FINAL chunk emits a token — sample (and advance
            # the key) there alone
            if req.do_sample and end == len(src):
                keys[i] = req._key
                temp[i] = req.temperature
                topk[i] = req.top_k or 0
                topp[i] = -1.0 if req.top_p is None else req.top_p
                dos[i] = True
            ends.append(end)
        for i in range(S, Sp):
            # pad with duplicates of row 0: the scatter re-writes the same
            # data to the same row (last-write-wins on identical values)
            ids[i], rows[i], starts[i], last[i] = (ids[0], rows[0],
                                                   starts[0], last[0])
        args = (jnp.asarray(ids), jnp.asarray(rows), jnp.asarray(starts),
                jnp.asarray(last))
        return active, args, ends, (keys, temp, topk, topp, dos)

    def _advance_prefill(self, work=None):
        """Run ONE batched prefill chunk across every prefilling slot —
        decode of the other slots interleaves between chunks, and a burst
        of long prompts advances together instead of one-at-a-time
        (round-2 VERDICT Weak #6). ``work`` forwards an already-gathered
        ``_gather_prefill()`` result (gathering twice would rebind
        staging streams)."""
        if work is None:
            work = self._gather_prefill()
        if work is None:
            return
        active, args, ends, samp = work
        sampling = bool(np.any(samp[4]))
        prefill = self._prefill_batch_fn(args[0].shape[0], sampling)
        self.stats["prefill_chunk_dispatches"] += 1
        target = self.staging if self.paged else self.caches
        target, nxt, keys, lp, tlv, tli = prefill(
            self._state, target, *args,
            *(jnp.asarray(a) for a in samp))
        if self.paged:
            self.staging = target
        else:
            self.caches = target
        nxt, keys, lp, tlv, tli = jax.device_get(
            (nxt, keys, lp, tlv, tli))
        self._apply_prefill(active, ends, nxt, keys, lp,
                            tlv if self._tln else None,
                            tli if self._tln else None)

    def _apply_prefill(self, active, ends, nxt, keys=None, lps=None,
                       tlv=None, tli=None):
        for i, (slot, row) in enumerate(active):
            req = self.slot_req[slot]
            if req.done:  # cancelled mid-prefill: freed by _collect
                continue
            req.prefill_pos = ends[i]
            src_len = len(self._prompt_of(req))
            if ends[i] < src_len:
                continue
            P = src_len
            if self.paged:
                self._commit_staging(slot, P, row)
                self._free_staging.append(self._staging_of.pop(slot))
            if req.do_sample and keys is not None:
                req._key = keys[i].copy()
            self.slot_state[slot] = "decode"
            self.slot_pos[slot] = P  # first decode step writes KV row P
            self._load_slot_samp(slot, req)
            tok = int(nxt[i])
            self.slot_tok[slot] = tok
            top = None
            if tlv is not None and req.top_logprobs:
                nn_ = req.top_logprobs
                top = (tlv[i, :nn_].tolist(), tli[i, :nn_].tolist())
            self._append_token(req, slot, tok,
                               float(lps[i]) if lps is not None else None,
                               top=top)
            logger.debug("slot %d prefilled request %d (P=%d)",
                         slot, req.uid, P)

    def _load_slot_samp(self, slot: int, req: Request) -> None:
        self.slot_samp[slot] = req.do_sample
        self.slot_temp[slot] = req.temperature
        self.slot_topk[slot] = req.top_k or 0
        self.slot_topp[slot] = -1.0 if req.top_p is None else req.top_p
        if req._key is not None:
            self.slot_keys[slot] = req._key

    # -------------------------------------------------------- paged helpers
    def _alloc_page(self, slot: int, page_idx: int) -> bool:
        if not self.free_pages and self._pc is not None:
            # evict a reusable (registered, unreferenced) prefix page
            # before resorting to preemption
            pid = self._pc.evict_one()
            if pid is not None:
                self.free_pages.append(pid)
        if not self.free_pages:
            return False
        pid = self.free_pages.pop()
        if self._pc is not None:
            self._pc.acquire(pid)
        self.slot_pages[slot].append(pid)
        self.block_tables[slot, page_idx] = pid
        self._bt_dirty = True
        return True

    def _preempt_victim(self, protect: int | None) -> bool:
        """Free pool pressure by preempting the latest-arrived decoding
        slot (vLLM's recompute-preemption policy): its pages are freed and
        the request is requeued at the FRONT to re-prefill
        prompt+generated on its next turn — exact resumption (greedy is
        deterministic; a sampled request's PRNG key rides in ``_key``)."""
        victims = [s for s in range(self.n_slots)
                   if s != protect and self.slot_state[s] == "decode"
                   and self.slot_req[s] is not None]
        if not victims:
            return False
        victim = max(victims, key=lambda s: self.slot_req[s].uid)
        req = self.slot_req[victim]
        req.prefill_pos = 0
        req.preemptions += 1
        self.stats["preemptions"] += 1
        self.queue.insert(0, req)
        self.slot_req[victim] = None
        self.slot_state[victim] = "idle"
        self.slot_samp[victim] = False
        logger.info("preempted slot %d (request %d, %d generated) to free "
                    "%d pages", victim, req.uid, len(req.generated),
                    len(self.slot_pages[victim]))
        self._free_slot_pages(victim)
        return True

    def _ensure_pages(self, slot: int, upto_pos: int) -> None:
        need = min(upto_pos // self.page_size + 1, self.pmax)
        while len(self.slot_pages[slot]) < need:
            if not self._alloc_page(slot, len(self.slot_pages[slot])):
                if not self._preempt_victim(protect=slot):
                    raise RuntimeError(
                        f"paged KV pool exhausted ({self.n_pages} pages) "
                        "with no preemptable slot — the pool cannot hold "
                        "even the remaining request; raise n_pages")

    def _free_slot_pages(self, slot: int) -> None:
        if self._pc is not None:
            for pid in reversed(self.slot_pages[slot]):
                if self._pc.release(pid):
                    self.free_pages.append(pid)
        else:
            self.free_pages.extend(reversed(self.slot_pages[slot]))
        self.slot_pages[slot] = []
        self.block_tables[slot] = 0
        self._bt_dirty = True

    def _bt_device(self):
        if self._bt_dirty or self._bt_dev is None:
            self._bt_dev = jnp.asarray(self.block_tables)
            self._bt_dirty = False
        return self._bt_dev

    def _stage_copy_fn(self):
        key = "stage_copy"
        if key not in self._jit_cache and self.latent:
            page = self.page_size

            @functools.partial(jax.jit, donate_argnums=(0,))
            def copy_latent(pools, staging, row, pid, start):
                out = []
                for pool, lc in zip(pools, staging):
                    l1 = jax.lax.dynamic_slice_in_dim(lc.lat, row, 1,
                                                      axis=0)
                    rows = jax.lax.dynamic_slice_in_dim(l1, start, page,
                                                        axis=2)
                    out.append(pool._replace(
                        lat_pages=pool.lat_pages.at[pid].set(
                            rows[0].astype(pool.lat_pages.dtype))))
                return out

            self._jit_cache[key] = copy_latent
        if key not in self._jit_cache:
            page = self.page_size
            quantized = self.pools[0].k_scales is not None

            @functools.partial(jax.jit, donate_argnums=(0,))
            def copy(pools, staging, row, pid, start):
                from ..models.llama import _kv_quant

                out = []
                for pool, cache in zip(pools, staging):
                    k1 = jax.lax.dynamic_slice_in_dim(cache.k, row, 1,
                                                      axis=0)
                    v1 = jax.lax.dynamic_slice_in_dim(cache.v, row, 1,
                                                      axis=0)
                    kr = jax.lax.dynamic_slice_in_dim(k1, start, page,
                                                      axis=2)  # [1,H,page,D]
                    vr = jax.lax.dynamic_slice_in_dim(v1, start, page,
                                                      axis=2)
                    if quantized and pool.k_pages.dtype == jnp.uint8:
                        # int4 pool: token-half-split page packing with
                        # per-(token, head) asymmetric affine params
                        from ..models.llama import (_kv_pack_page_int4,
                                                    _kv_quant4_asym_codes)

                        kc4, ks, kof = _kv_quant4_asym_codes(kr)
                        vc4, vs, vof = _kv_quant4_asym_codes(vr)
                        pool = pool._replace(
                            k_pages=pool.k_pages.at[pid].set(
                                _kv_pack_page_int4(kc4)[0]),
                            k_scales=pool.k_scales.at[pid].set(ks[0]),
                            k_offs=pool.k_offs.at[pid].set(kof[0]),
                            v_pages=pool.v_pages.at[pid].set(
                                _kv_pack_page_int4(vc4)[0]),
                            v_scales=pool.v_scales.at[pid].set(vs[0]),
                            v_offs=pool.v_offs.at[pid].set(vof[0]))
                    elif quantized:
                        fmt = ("int8" if pool.k_pages.dtype == jnp.int8
                               else "fp8_e4m3")
                        kc, ks = _kv_quant(kr, fmt=fmt)
                        vc, vs = _kv_quant(vr, fmt=fmt)
                        pool = pool._replace(
                            k_pages=pool.k_pages.at[pid].set(kc[0]),
                            k_scales=pool.k_scales.at[pid].set(ks[0]),
                            v_pages=pool.v_pages.at[pid].set(vc[0]),
                            v_scales=pool.v_scales.at[pid].set(vs[0]))
                    else:
                        pool = pool._replace(
                            k_pages=pool.k_pages.at[pid].set(
                                kr[0].astype(pool.k_pages.dtype)),
                            v_pages=pool.v_pages.at[pid].set(
                                vr[0].astype(pool.v_pages.dtype)))
                    out.append(pool)
                return out

            self._jit_cache[key] = copy
        return self._jit_cache[key]

    def _unstage_copy_fn(self):
        """Inverse of ``_stage_copy_fn``: dequantize ONE pool page into a
        staging row's rows [start, start+page) — how a cached prefix's KV
        becomes attendable by the remainder prefill chunks. Numerics
        match decode exactly: the remainder attends the same dequantized
        codes the paged attention kernel reads."""
        key = "unstage_copy"
        if key not in self._jit_cache and self.latent:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def uncopy_latent(pools, staging, row, pid, start):
                out = []
                for pool, lc in zip(pools, staging):
                    rows = jax.lax.dynamic_slice_in_dim(
                        pool.lat_pages, pid, 1, 0)   # [1, 1, page, C]
                    out.append(lc._replace(lat=jax.lax.dynamic_update_slice(
                        lc.lat, rows.astype(lc.lat.dtype),
                        (row, 0, start, 0))))
                return out

            self._jit_cache[key] = uncopy_latent
        if key not in self._jit_cache:
            page = self.page_size

            @functools.partial(jax.jit, donate_argnums=(1,))
            def uncopy(pools, staging, row, pid, start):
                out = []
                for pool, cache in zip(pools, staging):
                    kp = jax.lax.dynamic_slice_in_dim(
                        pool.k_pages, pid, 1, 0)
                    vp = jax.lax.dynamic_slice_in_dim(
                        pool.v_pages, pid, 1, 0)
                    if pool.k_scales is not None:
                        ks = jax.lax.dynamic_slice_in_dim(
                            pool.k_scales, pid, 1, 0)
                        vs = jax.lax.dynamic_slice_in_dim(
                            pool.v_scales, pid, 1, 0)
                    if pool.k_pages.dtype == jnp.uint8:
                        # int4 token-half-split bytes + per-token affine
                        ko = jax.lax.dynamic_slice_in_dim(
                            pool.k_offs, pid, 1, 0)
                        vo = jax.lax.dynamic_slice_in_dim(
                            pool.v_offs, pid, 1, 0)

                        def deq4(bts, sc, of):
                            c = jnp.concatenate(
                                [(bts & 15).astype(jnp.int8),
                                 (bts >> 4).astype(jnp.int8)],
                                axis=-2) - 8         # [1, Hkv, page, D]
                            return (sc[..., None] * c.astype(jnp.float32)
                                    + of[..., None])

                        kr, vr = deq4(kp, ks, ko), deq4(vp, vs, vo)
                    elif pool.k_scales is not None:
                        kr = kp.astype(jnp.float32) * ks[..., None]
                        vr = vp.astype(jnp.float32) * vs[..., None]
                    else:
                        kr, vr = kp, vp
                    k2 = jax.lax.dynamic_update_slice(
                        cache.k, kr.astype(cache.k.dtype),
                        (row, 0, start, 0))
                    v2 = jax.lax.dynamic_update_slice(
                        cache.v, vr.astype(cache.v.dtype),
                        (row, 0, start, 0))
                    out.append(cache._replace(k=k2, v=v2))
                return out

            self._jit_cache[key] = uncopy
        return self._jit_cache[key]

    def _stage_prefix(self, slot: int, row: int) -> None:
        """Copy a freshly-mapped cached prefix's KV from its pool pages
        into the slot's staging row (once, before its first remainder
        chunk)."""
        req = self.slot_req[slot]
        uncopy = self._unstage_copy_fn()
        for p in range(req._prefix_tokens // self.page_size):
            self.staging = uncopy(self.pools, self.staging, row,
                                  self.slot_pages[slot][p],
                                  p * self.page_size)
        req._prefix_unstaged = False

    def _commit_staging(self, slot: int, length: int, row: int) -> None:
        """Allocate pages for a freshly-prefilled slot and copy its staged
        rows (staging row ``row``) into them; pool pressure preempts a
        decoding victim rather than raising."""
        copy = self._stage_copy_fn()
        n_pages = (length + self.page_size - 1) // self.page_size
        req = self.slot_req[slot]
        shared = (req._prefix_tokens // self.page_size
                  if req is not None else 0)
        for p in range(shared, n_pages):
            while not self._alloc_page(slot, p):
                if not self._preempt_victim(protect=slot):
                    raise RuntimeError(
                        f"paged KV pool exhausted ({self.n_pages} pages) "
                        "committing a prefilled prompt with no "
                        "preemptable slot; raise n_pages")
            self.pools = copy(self.pools, self.staging, row,
                              self.slot_pages[slot][-1], p * self.page_size)
        if self._pc is not None and req is not None:
            # publish this prompt's full pages (immutable: decode and
            # speculative-window writes land at positions >= length,
            # i.e. page indices >= length // page_size)
            keys = self._pc.chunk_keys(self._prompt_of(req))
            for p in range(shared, length // self.page_size):
                self._pc.register(self.slot_pages[slot][p], keys[p])

    def _paged_decode_fn(self, k: int, sampling: bool):
        key = ("paged_decode", k, sampling, self._tln)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            nxt_fn = _next_token_fn(sampling)
            tln = self._tln

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode_many(state, pools, bt, toks, pos,
                            keys, temp, topk, topp, dos):
                m = nnx.merge(graphdef, state)
                _s4_prepare(m)
                pools = [p._replace(block_tables=bt) for p in pools]

                def body(i, carry):
                    toks, pos, pools, out, lps, keys, tlv, tli = carry
                    logits, pools = m(toks[:, None], positions=pos[:, None],
                                      caches=pools, cache_pos=pos)
                    nxt, keys, lp = nxt_fn(logits[:, 0], keys, temp, topk,
                                           topp, dos)
                    out = jax.lax.dynamic_update_slice(
                        out, nxt[:, None], (0, i))
                    lps = jax.lax.dynamic_update_slice(
                        lps, lp[:, None], (0, i))
                    if tln:
                        tv, ti = _top_n_logprobs(logits[:, 0], tln)
                        tlv = jax.lax.dynamic_update_slice(
                            tlv, tv[:, None], (0, i, 0))
                        tli = jax.lax.dynamic_update_slice(
                            tli, ti[:, None], (0, i, 0))
                    return nxt, pos + 1, pools, out, lps, keys, tlv, tli

                B = toks.shape[0]
                out0 = jnp.zeros((B, k), jnp.int32)
                lp0 = jnp.zeros((B, k), jnp.float32)
                tlv0 = jnp.zeros((B, k, max(tln, 1)), jnp.float32)
                tli0 = jnp.zeros((B, k, max(tln, 1)), jnp.int32)
                _t, _p, pools, out, lps, keys, tlv, tli = \
                    jax.lax.fori_loop(0, k, body, (toks, pos, pools,
                                                   out0, lp0, keys,
                                                   tlv0, tli0))
                return pools, out, lps, keys, tlv, tli

            self._jit_cache[key] = decode_many
        return self._jit_cache[key]

    def _combined_fn(self, n: int, k: int, sampling: bool):
        """ONE jitted program = one prefill chunk over ``n`` rows + ``k``
        decode steps for every active slot (contiguous mode). Halves the
        per-iteration dispatch count — over the tunnel each dispatch
        costs a 32-40 ms round trip, and locally-attached chips still pay
        launch + host-sync per dispatch (round-3 VERDICT Weak #5). The
        prefill writes and the decode slots' rows are disjoint, so the
        in-program order (prefill, then decode) is safe; slots finishing
        prefill this iteration start decoding next iteration."""
        key = ("combined", n, k, sampling)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            C = self.prefill_chunk
            nxt_fn = _next_token_fn(sampling)

            @functools.partial(jax.jit, donate_argnums=(1,))
            def combined(state, caches, ids, rows, starts, last_idx,
                         toks, pos, pkeys, ptemp, ptopk, ptopp, pdos,
                         dkeys, dtemp, dtopk, dtopp, ddos):
                m = nnx.merge(graphdef, state)
                _s4_prepare(m)
                positions = starts[:, None] + jnp.arange(C)[None, :]
                sub = jax.tree.map(lambda c: c[rows], caches)
                logits, sub = m(ids, positions=positions, caches=sub,
                                cache_pos=starts)
                caches = jax.tree.map(lambda c, s: c.at[rows].set(s),
                                      caches, sub)
                nxt, pkeys, plp = nxt_fn(logits[jnp.arange(n), last_idx],
                                         pkeys, ptemp, ptopk, ptopp, pdos)

                def body(i, carry):
                    toks, pos, caches, out, lps, dkeys = carry
                    lg, caches = m(toks[:, None], positions=pos[:, None],
                                   caches=caches, cache_pos=pos)
                    nx, dkeys, lp = nxt_fn(lg[:, 0], dkeys, dtemp, dtopk,
                                           dtopp, ddos)
                    out = jax.lax.dynamic_update_slice(
                        out, nx[:, None], (0, i))
                    lps = jax.lax.dynamic_update_slice(
                        lps, lp[:, None], (0, i))
                    return nx, pos + 1, caches, out, lps, dkeys

                out0 = jnp.zeros((toks.shape[0], k), jnp.int32)
                lp0 = jnp.zeros((toks.shape[0], k), jnp.float32)
                _t, _p, caches, out, lps, dkeys = jax.lax.fori_loop(
                    0, k, body, (toks, pos, caches, out0, lp0, dkeys))
                return caches, nxt, out, lps, pkeys, plp, dkeys

            self._jit_cache[key] = combined
        return self._jit_cache[key]

    def _combined_paged_fn(self, n: int, k: int, sampling: bool):
        """Paged-mode combined iteration: one prefill chunk over ``n``
        staging rows + ``k`` decode steps over the page pools in ONE
        jitted program. The prefill writes the (contiguous) staging
        cache and the decode writes the pools — disjoint buffers, so
        the in-program order is safe, mirroring ``_combined_fn``."""
        key = ("combined_paged", n, k, sampling)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            C = self.prefill_chunk
            nxt_fn = _next_token_fn(sampling)

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def combined(state, pools, staging, bt, ids, rows, starts,
                         last_idx, toks, pos,
                         pkeys, ptemp, ptopk, ptopp, pdos,
                         dkeys, dtemp, dtopk, dtopp, ddos):
                m = nnx.merge(graphdef, state)
                _s4_prepare(m)
                positions = starts[:, None] + jnp.arange(C)[None, :]
                sub = jax.tree.map(lambda c: c[rows], staging)
                logits, sub = m(ids, positions=positions, caches=sub,
                                cache_pos=starts)
                staging = jax.tree.map(lambda c, s: c.at[rows].set(s),
                                       staging, sub)
                nxt, pkeys, plp = nxt_fn(logits[jnp.arange(n), last_idx],
                                         pkeys, ptemp, ptopk, ptopp, pdos)
                pools = [p._replace(block_tables=bt) for p in pools]

                def body(i, carry):
                    toks, pos, pools, out, lps, dkeys = carry
                    lg, pools = m(toks[:, None], positions=pos[:, None],
                                  caches=pools, cache_pos=pos)
                    nx, dkeys, lp = nxt_fn(lg[:, 0], dkeys, dtemp, dtopk,
                                           dtopp, ddos)
                    out = jax.lax.dynamic_update_slice(
                        out, nx[:, None], (0, i))
                    lps = jax.lax.dynamic_update_slice(
                        lps, lp[:, None], (0, i))
                    return nx, pos + 1, pools, out, lps, dkeys

                out0 = jnp.zeros((toks.shape[0], k), jnp.int32)
                lp0 = jnp.zeros((toks.shape[0], k), jnp.float32)
                _t, _p, pools, out, lps, dkeys = jax.lax.fori_loop(
                    0, k, body, (toks, pos, pools, out0, lp0, dkeys))
                return pools, staging, nxt, out, lps, pkeys, plp, dkeys

            self._jit_cache[key] = combined
        return self._jit_cache[key]

    def _decode_many_fn(self, k: int, sampling: bool):
        key = ("decode_many", k, sampling, self._tln)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            nxt_fn = _next_token_fn(sampling)
            tln = self._tln

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode_many(state, caches, toks, pos,
                            keys, temp, topk, topp, dos):
                m = nnx.merge(graphdef, state)
                _s4_prepare(m)

                def body(i, carry):
                    toks, pos, caches, out, lps, keys, tlv, tli = carry
                    logits, caches = m(toks[:, None],
                                       positions=pos[:, None],
                                       caches=caches, cache_pos=pos)
                    nxt, keys, lp = nxt_fn(logits[:, 0], keys, temp, topk,
                                           topp, dos)
                    out = jax.lax.dynamic_update_slice(
                        out, nxt[:, None], (0, i))
                    lps = jax.lax.dynamic_update_slice(
                        lps, lp[:, None], (0, i))
                    if tln:
                        tv, ti = _top_n_logprobs(logits[:, 0], tln)
                        tlv = jax.lax.dynamic_update_slice(
                            tlv, tv[:, None], (0, i, 0))
                        tli = jax.lax.dynamic_update_slice(
                            tli, ti[:, None], (0, i, 0))
                    return nxt, pos + 1, caches, out, lps, keys, tlv, tli

                B = toks.shape[0]
                out0 = jnp.zeros((B, k), jnp.int32)
                lp0 = jnp.zeros((B, k), jnp.float32)
                tlv0 = jnp.zeros((B, k, max(tln, 1)), jnp.float32)
                tli0 = jnp.zeros((B, k, max(tln, 1)), jnp.int32)
                _t, _p, caches, out, lps, keys, tlv, tli = \
                    jax.lax.fori_loop(0, k, body, (toks, pos, caches,
                                                   out0, lp0, keys,
                                                   tlv0, tli0))
                return caches, out, lps, keys, tlv, tli

            self._jit_cache[key] = decode_many
        return self._jit_cache[key]

    def _spec_decode_fn(self, rounds: int, sampling: bool = False):
        """Jitted prompt-lookup speculative decode over all slots: each
        of ``rounds`` verify rounds proposes spec_k tokens per slot from
        the most recent spec_n-gram match in that slot's token buffer
        and verifies them in ONE (spec_k+1)-token window forward — the
        continuous-batching twin of
        generation.ngram_speculative_greedy_search (same KV-coverage
        argument: a rejected row's stale KV is rewritten by the next
        round's window before anything can attend to it)."""
        key = ("spec_decode", rounds, sampling)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            kk, nn = self.spec_k, self.spec_n
            eos = self.eos_token_id
            park = self.max_len  # parked slots decide above real rows

            @functools.partial(jax.jit, donate_argnums=(1,))
            def spec_decode(state, caches, buf, pos, lim, active,
                            keys, temp, topk, topp, dos):
                m_ = nnx.merge(graphdef, state)
                _s4_prepare(m_)
                samp = ((keys, temp, topk, topp, dos) if sampling
                        else None)
                return _spec_rounds(m_, caches, buf, pos, lim, active,
                                    rounds, kk, nn, eos, park, samp)

            self._jit_cache[key] = spec_decode
        return self._jit_cache[key]

    def _combined_spec_fn(self, n: int, rounds: int):
        """ONE jitted program = one prefill chunk over ``n`` rows + the
        speculative verify rounds for the decoding slots (spec engines
        are greedy-only, so the prefill emission is a plain argmax).
        Prefill rows and decode slots are disjoint, same safety argument
        as ``_combined_fn``."""
        key = ("combined_spec", n, rounds)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            C = self.prefill_chunk
            kk, nn = self.spec_k, self.spec_n
            eos = self.eos_token_id
            park = self.max_len

            @functools.partial(jax.jit, donate_argnums=(1,))
            def combined(state, caches, ids, rows, starts, last_idx,
                         buf, pos, lim, active):
                m_ = nnx.merge(graphdef, state)
                _s4_prepare(m_)
                positions = starts[:, None] + jnp.arange(C)[None, :]
                sub = jax.tree.map(lambda c: c[rows], caches)
                logits, sub = m_(ids, positions=positions, caches=sub,
                                 cache_pos=starts)
                caches = jax.tree.map(lambda c, sb: c.at[rows].set(sb),
                                      caches, sub)
                nxt = jnp.argmax(logits[jnp.arange(n), last_idx], axis=-1)
                caches, outs, ms, _k = _spec_rounds(
                    m_, caches, buf, pos, lim, active, rounds, kk, nn,
                    eos, park)
                return caches, nxt, outs, ms

            self._jit_cache[key] = combined
        return self._jit_cache[key]

    def _spec_args(self):
        """(buf, pos, lim, active) host arrays + the decoding slot list
        for a speculative dispatch."""
        dec = [s for s in range(self.n_slots)
               if self.slot_state[s] == "decode"]
        L = self._cache_rows
        buf = np.zeros((self.n_slots, L), np.int32)
        pos = np.ones((self.n_slots,), np.int32)  # parked slots: b=0
        lim = np.zeros((self.n_slots,), np.int32)
        act = np.zeros((self.n_slots,), bool)
        for s_ in dec:
            req = self.slot_req[s_]
            toks = self._prompt_of(req)
            buf[s_, :len(toks)] = toks
            pos[s_] = len(toks)
            lim[s_] = min(len(req.prompt) + req.max_new_tokens,
                          self.max_len)
            act[s_] = True
        return dec, buf, pos, lim, act

    def _apply_spec(self, dec, outs, ms, rounds: int, keys=None):
        r0, a0 = self.stats["spec_rounds"], self.stats["spec_accepted"]
        for s_ in dec:
            req = self.slot_req[s_]
            if req is None:
                continue
            if keys is not None and req.do_sample:
                # one split per emitted token on device; host truncation
                # only happens on DONE requests (stop tokens/sequences),
                # whose key is never drawn again — same convention as
                # ``_apply_decode``
                req._key = keys[s_].copy()
                self.slot_keys[s_] = keys[s_]
            for r_ in range(rounds):
                if req.done:
                    break
                mr = int(ms[s_, r_])
                applied = 0
                for j in range(mr):
                    if req.done:
                        break
                    self.slot_pos[s_] += 1
                    tok = int(outs[s_, r_, j])
                    self.slot_tok[s_] = tok
                    # spec rounds emit argmax tokens; logprobs are NaN
                    # placeholders (no logprob epilogue in the window
                    # program)
                    self._append_token(req, s_, tok, None)
                    applied += 1
                if applied > 0:
                    # count only host-APPLIED tokens so tokens/round
                    # observability matches generated_tokens (a stop/
                    # EOS/max_new may truncate the device's count)
                    self.stats["spec_rounds"] += 1
                    self.stats["spec_accepted"] += applied
        if self.spec_adaptive:
            dr = self.stats["spec_rounds"] - r0
            da = self.stats["spec_accepted"] - a0
            if dr > 0:
                rate = da / dr
                self._spec_ewma = (rate if self._spec_ewma is None else
                                   0.6 * self._spec_ewma + 0.4 * rate)
                if self._spec_ewma < self.spec_min_rate:
                    self._spec_cool = 8  # plain-decode dispatches before
                    #                      the next speculation probe

    def _spec_ensure_pages(self, rounds: int):
        """Worst-case page allocation for a spec dispatch: every round
        can advance a slot by spec_k+1 tokens and the verify window
        writes spec_k rows past the last decided one."""
        W = self.spec_k + 1
        for slot in range(self.n_slots):
            if self.slot_state[slot] == "decode":
                req = self.slot_req[slot]
                decided = len(self._prompt_of(req))
                upto = min(decided + rounds * W + self.spec_k,
                           self.max_len - 1)
                self._ensure_pages(slot, upto)

    def _spec_step(self, rounds: int):
        """One speculative decode dispatch: ``rounds`` verify rounds for
        every decoding slot (1..spec_k+1 tokens each per round)."""
        if self.paged:
            self._spec_ensure_pages(rounds)
        self.stats["decode_dispatches"] += 1
        dec, buf, pos, lim, act = self._spec_args()
        if not dec:
            return
        sampling = bool(self.slot_samp[dec].any())
        samp = self._decode_samp_args()
        if self.paged:
            fn = self._spec_decode_paged_fn(rounds, sampling)
            self.pools, outs, ms, keys = fn(
                self._state, self.pools, self._bt_device(),
                jnp.asarray(buf), jnp.asarray(pos), jnp.asarray(lim),
                jnp.asarray(act), *samp)
        else:
            fn = self._spec_decode_fn(rounds, sampling)
            self.caches, outs, ms, keys = fn(
                self._state, self.caches, jnp.asarray(buf),
                jnp.asarray(pos), jnp.asarray(lim), jnp.asarray(act),
                *samp)
        outs, ms, keys = jax.device_get((outs, ms, keys))
        self._apply_spec(dec, outs, ms, rounds,
                         keys if sampling else None)

    def _spec_decode_paged_fn(self, rounds: int, sampling: bool = False):
        key = ("spec_decode_paged", rounds, sampling)
        if key not in self._jit_cache:
            graphdef = self._graphdef
            kk, nn = self.spec_k, self.spec_n
            eos = self.eos_token_id
            park = self.max_len

            @functools.partial(jax.jit, donate_argnums=(1,))
            def spec_decode(state, pools, bt, buf, pos, lim, active,
                            keys, temp, topk, topp, dos):
                m_ = nnx.merge(graphdef, state)
                _s4_prepare(m_)
                pools = [p._replace(block_tables=bt) for p in pools]
                samp = ((keys, temp, topk, topp, dos) if sampling
                        else None)
                return _spec_rounds(m_, pools, buf, pos, lim, active,
                                    rounds, kk, nn, eos, park, samp)

            self._jit_cache[key] = spec_decode
        return self._jit_cache[key]

    def _fill_slots(self):
        for slot in range(self.n_slots):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue[0]
            hits: list[int] = []
            if self.paged:
                src = self._prompt_of(req)
                if self._pc is not None:
                    self._pc.lookups += 1
                    _, hits = self._pc.probe(src)
                    # chunk starts must stay DUS-safe: later starts step
                    # by prefill_chunk from the first remainder start,
                    # so the consumed prefix must be a chunk multiple
                    # (drop trailing hit pages otherwise — at most
                    # chunk-1 tokens recomputed)
                    while hits and (len(hits) * self.page_size) \
                            % self.prefill_chunk:
                        hits.pop()
                # admission control: only admit when the pool can hold
                # the (resumed) prompt plus one decode page; otherwise
                # wait for retirements instead of thrashing preemption.
                # Cached-prefix pages are already resident — only the
                # remainder needs fresh pages (reusable pages count as
                # allocatable headroom)
                need = ((len(src) - len(hits) * self.page_size)
                        // self.page_size + 2)
                avail = len(self.free_pages) + (
                    len(self._pc.reusable) if self._pc is not None else 0)
                if avail < min(need, self.pmax):
                    if all(r is None for r in self.slot_req):
                        raise RuntimeError(
                            f"request {req.uid} needs ~{need} pages but "
                            f"the idle pool has {avail} "
                            f"free of {self.n_pages} — the pool cannot "
                            "hold this request at all; raise n_pages")
                    break
            self.queue.pop(0)
            self.slot_req[slot] = req
            self.slot_state[slot] = "prefill"
            req.prefill_pos = 0
            req._prefix_tokens = 0
            req._prefix_unstaged = False
            if hits:
                # map the cached prefix into this slot's block table and
                # skip its prefill; _gather_prefill stages its KV before
                # the first remainder chunk runs
                for p, pid in enumerate(hits):
                    self._pc.acquire(pid)
                    self.slot_pages[slot].append(pid)
                    self.block_tables[slot, p] = pid
                    self._bt_dirty = True
                req._prefix_tokens = len(hits) * self.page_size
                req._prefix_unstaged = True
                req.prefill_pos = req._prefix_tokens
                self._pc.hit_tokens += req._prefix_tokens
                self.stats["prefix_hit_tokens"] += req._prefix_tokens
                logger.debug("slot %d: prefix cache hit %d pages for "
                             "request %d", slot, len(hits), req.uid)
            logger.debug("slot %d <- request %d (P=%d)", slot, req.uid,
                         len(req.prompt))

    def _decode_positions(self):
        """Per-slot decode positions; non-decoding slots park their garbage
        cache write on the last row (never attended: causal mask excludes
        it and requests terminate before reaching it)."""
        park = self._cache_rows - 1
        return np.where(
            np.asarray([s == "decode" for s in self.slot_state]),
            self.slot_pos, park).astype(np.int32)

    def step(self):
        """Single decode step (works in contiguous and paged modes)."""
        return self.step_many(1)

    def step_many(self, k: int = 8):
        """Decode ``k`` tokens for every active slot in one dispatch."""
        k = max(int(k), 1)
        if self.paged:
            # page allocation (and any preemption) BEFORE the decode set
            # and operand snapshot are taken
            for slot in range(self.n_slots):
                if self.slot_state[slot] == "decode":
                    self._ensure_pages(
                        slot, min(int(self.slot_pos[slot]) + k,
                                  self.max_len - 1))
        self.stats["decode_dispatches"] += 1
        dec = [s for s in range(self.n_slots)
               if self.slot_state[s] == "decode"]
        toks = jnp.asarray(self.slot_tok)
        pos = jnp.asarray(self._decode_positions())
        sampling = bool(self.slot_samp[dec].any()) if dec else False
        samp = self._decode_samp_args()
        if self.paged:
            decode_many = self._paged_decode_fn(k, sampling)
            self.pools, out, lps, keys, tlv, tli = decode_many(
                self._state, self.pools, self._bt_device(),
                toks, pos, *samp)
        else:
            decode_many = self._decode_many_fn(k, sampling)
            self.caches, out, lps, keys, tlv, tli = decode_many(
                self._state, self.caches, toks, pos, *samp)
        # one batched host fetch per dispatch (see readback_ab.log)
        out, keys, lps, tlv, tli = jax.device_get(
            (out, keys, lps, tlv, tli))
        self._apply_decode(out, dec, k, keys, lps,
                           tlv if self._tln else None,
                           tli if self._tln else None)

    def _append_token(self, req: Request, slot: int, tok: int,
                      lp: float | None = None, top=None) -> None:
        """Append one decided token to ``req`` with the full stop
        treatment: counters, logprob, streaming callback, EOS /
        per-request stop tokens (kept in the output), multi-token stop
        sequences (trimmed from the output), max_new_tokens, and
        cache-capacity stop."""
        req.generated.append(tok)
        req.logprobs.append(lp if lp is not None else float("nan"))
        if req.top_logprobs and top is not None:
            req.top_items.append(top)
        self.stats["generated_tokens"] += 1
        if req.stream is not None:
            req.stream(req, tok)
        if ((self.eos_token_id is not None and tok == self.eos_token_id)
                or tok in req.stop_token_ids):
            req.done = True
        for seq in req.stop_sequences:
            L = len(seq)
            if L and len(req.generated) >= L and \
                    tuple(req.generated[-L:]) == seq:
                del req.generated[-L:]
                del req.logprobs[-L:]
                if req.top_items:
                    del req.top_items[-L:]
                self.stats["generated_tokens"] -= L
                req.done = True
                break
        if (len(req.generated) >= req.max_new_tokens
                or self.slot_pos[slot] >= self.max_len - 1):
            req.done = True

    def _apply_decode(self, out, dec_slots, k: int, keys=None, lps=None,
                      tlv=None, tli=None):
        """Host bookkeeping for one [n_slots, k] decode result, applied
        only to ``dec_slots`` (the slots that were decoding when the
        dispatch was issued — state may have moved since)."""
        for slot in dec_slots:
            req = self.slot_req[slot]
            if req is None:
                continue
            for j in range(k):
                if req.done:
                    break
                self.slot_pos[slot] += 1
                tok = int(out[slot, j])
                self.slot_tok[slot] = tok
                top = None
                if tlv is not None and req.top_logprobs:
                    nn_ = req.top_logprobs
                    top = (tlv[slot, j, :nn_].tolist(),
                           tli[slot, j, :nn_].tolist())
                self._append_token(
                    req, slot, tok,
                    float(lps[slot, j]) if lps is not None else None,
                    top=top)
            if req.do_sample and keys is not None:
                # device key advanced once per decode step; an active
                # request consumed every step, so this is its post-last-
                # token state (done rows never use the key again)
                req._key = keys[slot].copy()
                self.slot_keys[slot] = keys[slot]

    def _collect(self):
        done = []
        for slot, req in enumerate(self.slot_req):
            if req is not None and req.done:
                done.append(req)
                self.slot_req[slot] = None
                self.slot_state[slot] = "idle"
                self.slot_samp[slot] = False
                if self.paged:
                    self._free_slot_pages(slot)
                    row = self._staging_of.pop(slot, None)
                    if row is not None:  # cancelled mid-prefill
                        self._free_staging.append(row)
        return done
