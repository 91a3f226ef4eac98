"""Speculative (draft-verify) greedy decoding.

A small draft model proposes ``k`` tokens autoregressively; the target
verifies all of them in ONE forward over a (k+1)-token window and accepts
the longest matching prefix plus its own correction token — so each target
dispatch yields 1..k+1 tokens. For greedy decoding this is EXACT: the
output is bit-identical to :func:`~..generation.greedy_search` on the
target alone (verification recomputes the target argmax at every emitted
position).

No reference counterpart (the reference delegates serving to vLLM /
optimum-habana); rebuilt natively because decode on TPU is weight-stream
bound (PERF_NOTES.md) — verifying k+1 positions costs the same weight
traffic as one, so latency drops by ~the mean acceptance length.

TPU-first structure: everything is ONE jitted ``lax.while_loop`` with
static shapes — every round processes exactly a (k+1)-token window at a
per-row offset (``cache_pos`` carries a per-row [B] vector, the same
mechanism continuous batching uses). Rows rejected in a round leave stale
KV entries, which is safe by construction: the next round's window starts
at the first rejected index and rewrites those rows before any query can
attend to them (the position-based mask only exposes ``key_pos <=
query_pos``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.llama import init_kv_cache
from .generate import _cached_program
from .generate import _split as _split_gen


def _split(model):
    graphdef, state, bind = _split_gen(model)
    return graphdef, state, bind


def speculative_greedy_search(target, draft, input_ids,
                              max_new_tokens: int = 32, k: int = 4,
                              eos_token_id: int | None = None,
                              max_len: int | None = None,
                              return_stats: bool = False):
    """Greedy decode ``target`` with ``draft`` speculation (exact).

    Args:
        target: the (quantized) model whose output distribution is served.
        draft: a cheaper model over the same vocabulary (smaller preset,
            deeper-quantized sibling, ...). Quality only affects speed.
        k: drafted tokens per round (window = k+1).
        return_stats: also return ``{"rounds": r, "accept_rate": ...}``.
    """
    B, P = input_ids.shape
    need = P + max_new_tokens + k + 1
    if max_len is not None and max_len < need:
        # the verify window writes up to k tokens past the last decided
        # position; a shorter cache would clamp the write onto live KV rows
        raise ValueError(
            f"max_len={max_len} too small for speculative decoding: need "
            f"prompt + max_new_tokens + k + 1 = {need} rows of KV margin")
    total = max_len or need

    def caches_for(m):
        quantized = (getattr(m, "kv_cache_format", "int8")
                     if getattr(m, "kv_cache_quantized", False) else False)
        return init_kv_cache(m.cfg, B, total, quantized=quantized)

    tgd, tstate, tbind = _split(target)
    dgd, dstate, dbind = _split(draft)
    tcaches, dcaches = caches_for(target), caches_for(draft)

    @functools.partial(jax.jit, static_argnames=("mnt", "kk"))
    def _spec_go(tstate, dstate, input_ids, tcaches, dcaches, mnt, kk):
        # B/P come from the traced operand, NOT the enclosing call: the
        # program is cached across calls (below), so a closure over the
        # first call's prompt shape would replay stale shapes on the next
        # (jit retraces per input shape and rebuilds these correctly).
        B, P = input_ids.shape
        tapply, dapply = tbind(tstate), dbind(dstate)
        W = kk + 1
        # prefill both models on the prompt
        prompt_pos = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
        _, tcaches = tapply(input_ids, prompt_pos, tcaches, 0)
        _, dcaches = dapply(input_ids, prompt_pos, dcaches, 0)

        out0 = jnp.zeros((B, mnt + W), jnp.int32)  # margin absorbs overshoot
        pos0 = jnp.full((B,), P, jnp.int32)        # decided-token count
        cur0 = input_ids[:, -1:]
        fin0 = jnp.zeros((B,), bool)

        def cond(c):
            pos, fin, rounds = c[0], c[5], c[6]
            return jnp.any(~fin & (pos - P < mnt)) & (rounds < mnt + 1)

        def body(c):
            pos, cur, out, tcaches, dcaches, fin, rounds, accepted, hist = c
            b = pos - 1  # window start index (last decided token)

            # --- draft kk+1 micro-steps: propose d1..dkk, fill rows b..b+kk
            def dstep(j, dc):
                tok, dcaches, win = dc
                lg, dcaches = dapply(tok, (b + j)[:, None],
                                     dcaches, b + j)
                nxt = jnp.argmax(lg[:, -1], axis=-1)[:, None].astype(
                    jnp.int32)
                win = jax.lax.dynamic_update_slice(win, tok, (0, j))
                return nxt, dcaches, win

            win0 = jnp.zeros((B, W + 1), jnp.int32)
            last, dcaches, win = jax.lax.fori_loop(
                0, W, dstep, (cur, dcaches, win0))
            win = jax.lax.dynamic_update_slice(win, last, (0, W))
            window = win[:, :W]            # [cur, d1..dkk]
            drafted = win[:, 1:W + 1]      # [d1..dkk, d_{kk+1}] (last unused)

            # --- verify: one target forward over the window
            positions = b[:, None] + jnp.arange(W)[None, :]
            lg, tcaches = tapply(window, positions, tcaches, b)
            t = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, W]

            # --- longest accepted prefix (+1 correction/bonus token)
            match = drafted[:, :kk] == t[:, :kk]
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                            axis=1)                       # 0..kk
            m = n_acc + 1                                 # emitted per row
            if eos_token_id is not None:
                is_eos = t == eos_token_id
                # cut at the first EOS inside the emitted span
                eos_idx = jnp.argmax(is_eos, axis=1)
                has_eos = jnp.any(is_eos, axis=1) & (eos_idx < m)
                m = jnp.where(has_eos, eos_idx + 1, m)
            else:
                has_eos = jnp.zeros((B,), bool)
            m = jnp.where(fin, 0, m)

            # --- write the whole window of target tokens; rows a later
            # round re-decides are overwritten then (same coverage rule
            # as the KV rows). Finished rows write their old content back.
            def row(o, tw, p, f):
                old = jax.lax.dynamic_slice(o, (p,), (W,))
                return jax.lax.dynamic_update_slice(
                    o, jnp.where(f, old, tw), (p,))

            out = jax.vmap(row)(out, t, pos - P, fin)
            cur = jnp.take_along_axis(
                t, jnp.maximum(m - 1, 0)[:, None], axis=1)
            cur = jnp.where(fin[:, None], c[1], cur)
            accepted = accepted + jnp.sum(jnp.where(fin, 0, m))
            # accepted-length histogram: one bucket per emitted-count
            # 1..kk+1 (bucket 0 = finished rows skipped this round)
            hist = hist + jnp.sum(
                jax.nn.one_hot(m, kk + 2, dtype=jnp.int32), axis=0)
            pos = pos + m
            fin = fin | has_eos | (pos - P >= mnt)
            return (pos, cur, out, tcaches, dcaches, fin, rounds + 1,
                    accepted, hist)

        (pos, _cur, out, _tc, _dc, _fin, rounds, accepted,
         hist) = jax.lax.while_loop(
            cond, body,
            (pos0, cur0, out0, tcaches, dcaches, fin0,
             jnp.int32(0), jnp.int32(0), jnp.zeros((kk + 2,), jnp.int32)))

        # match greedy_search's tail semantics: a row that hit EOS repeats
        # the EOS token while any other row is still decoding (greedy's
        # frozen rows re-emit their last token), and everything past the
        # step the whole batch stopped at stays zero.
        idx = jnp.arange(mnt + W)[None, :]
        decided = pos - P
        maxc = jnp.minimum(jnp.max(decided), mnt)
        if eos_token_id is not None:
            lastpos = jnp.maximum(decided - 1, 0)
            last = jnp.take_along_axis(out, lastpos[:, None], axis=1)[:, 0]
            pad = jnp.where((last == eos_token_id)[:, None] & (idx < maxc),
                            eos_token_id, 0)
        else:
            pad = jnp.zeros((B, mnt + W), jnp.int32)
        out = jnp.where(idx < decided[:, None], out, pad)[:, :mnt]
        return (jnp.concatenate([input_ids, out], axis=1), rounds,
                accepted, hist)

    # program cache: without it every call recompiles (generate.py
    # _cached_program docstring); validated on BOTH models' graphdefs.
    # The key deliberately omits the draft's identity: graphdef equality
    # (tgd, dgd) already invalidates on a different/modified draft, and an
    # id()-based key would accumulate one stale entry per transient draft.
    go = _cached_program(target, ("speculative", eos_token_id),
                         (tgd, dgd), lambda: _spec_go)
    seq, rounds, accepted, hist = go(tstate, dstate, input_ids, tcaches,
                                     dcaches, max_new_tokens, k)
    if return_stats:
        r = max(int(rounds), 1)
        import numpy as np

        return seq, {"rounds": int(rounds),
                     "tokens_per_round": float(accepted) / r / B,
                     # accept_hist[m] = rounds in which a row emitted m
                     # tokens (m = accepted prefix + 1 correction)
                     "accept_hist": np.asarray(hist).tolist()}
    return seq


# ---------------------------------------------------------------------------
# Draft-free speculation: prompt-lookup / n-gram proposals
# ---------------------------------------------------------------------------

def ngram_speculative_greedy_search(model, input_ids,
                                    max_new_tokens: int = 32, k: int = 8,
                                    n: int = 2,
                                    eos_token_id: int | None = None,
                                    max_len: int | None = None,
                                    return_stats: bool = False):
    """Greedy decoding with PROMPT-LOOKUP speculation (exact, no draft).

    Instead of a draft model, each round proposes the ``k`` tokens that
    followed the most recent occurrence of the current ``n``-token suffix
    in the prompt + generated context (PLD / n-gram speculation — the
    capability class the reference's serving stack inherits from vLLM;
    here TPU-native). The target verifies the (k+1)-token window exactly
    like :func:`speculative_greedy_search`, so the output is bit-identical
    to :func:`~..generation.greedy_search` — proposals only change SPEED.

    Why it wins on TPU: B=1 decode is weight-stream bound (PERF_NOTES),
    so verifying k+1 positions costs ~the same HBM traffic as one; the
    proposal itself is a vectorized [B, L] comparison (no forward pass at
    all — unlike a model draft there is NO floor on the draft cost). On
    repetitive / long-prompt workloads (summarization, code edits,
    retrieval) acceptance is high and the speedup approaches
    tokens/round; in the worst case every round still emits >= 1 token,
    so the overhead is only the window's extra attention+logits.
    """
    B, P = input_ids.shape
    assert n >= 1 and k >= 1
    need = P + max_new_tokens + k + 1
    if max_len is not None and max_len < need:
        raise ValueError(
            f"max_len={max_len} too small: need prompt + max_new_tokens "
            f"+ k + 1 = {need} rows of KV margin")
    total = max_len or need

    from .generate import _alloc_caches

    caches = _alloc_caches(model, B, total)
    gd, state, bind = _split(model)

    @functools.partial(jax.jit, static_argnames=("mnt", "kk", "nn"))
    def _pld_go(state, input_ids, caches, mnt, kk, nn):
        B, P = input_ids.shape
        apply = bind(state)
        W = kk + 1
        L = P + mnt + W          # token buffer: prompt + decided + margin
        buf0 = jnp.zeros((B, L), jnp.int32)
        buf0 = jax.lax.dynamic_update_slice(buf0, input_ids, (0, 0))

        prompt_pos = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
        _, caches = apply(input_ids, prompt_pos, caches, 0)

        pos0 = jnp.full((B,), P, jnp.int32)
        cur0 = input_ids[:, -1:]
        fin0 = jnp.zeros((B,), bool)

        def cond(c):
            pos, fin, rounds = c[0], c[4], c[5]
            return jnp.any(~fin & (pos - P < mnt)) & (rounds < mnt + 1)

        def body(c):
            pos, cur, buf, caches, fin, rounds, accepted, hist = c
            b = pos - 1

            # --- propose: last occurrence of the n-token suffix, then
            # the k tokens that followed it (all decided context)
            sidx = pos[:, None] - nn + jnp.arange(nn)[None, :]
            suffix = jnp.take_along_axis(buf, jnp.maximum(sidx, 0), axis=1)
            nwin = L - nn + 1
            eq = jnp.ones((B, nwin), bool)
            for i in range(nn):              # static n, unrolled compares
                eq = eq & (jax.lax.dynamic_slice_in_dim(buf, i, nwin, 1)
                           == suffix[:, i:i + 1])
            jidx = jnp.arange(nwin)[None, :]
            # continuation must start inside decided context, and the
            # trivial match (the suffix itself, ending at pos) is out
            valid = eq & (jidx + nn < pos[:, None])
            j = jnp.max(jnp.where(valid, jidx, -1), axis=1)     # [B]
            has = j >= 0
            gidx = (j + nn)[:, None] + jnp.arange(kk)[None, :]
            prop = jnp.take_along_axis(
                buf, jnp.clip(gidx, 0, L - 1), axis=1)
            # no match: repeat the last token (verification still nets
            # >= 1 token/round; repetition is also the best blind guess
            # on the loops this method targets)
            prop = jnp.where(has[:, None], prop,
                             jnp.broadcast_to(cur, (B, kk))).astype(
                                 jnp.int32)

            # --- verify: one target forward over [cur, p1..pk]
            window = jnp.concatenate([cur, prop], axis=1)       # [B, W]
            positions = b[:, None] + jnp.arange(W)[None, :]
            lg, caches = apply(window, positions, caches, b)
            t = jnp.argmax(lg, axis=-1).astype(jnp.int32)       # [B, W]

            match = prop == t[:, :kk]
            n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                            axis=1)
            m = n_acc + 1
            if eos_token_id is not None:
                is_eos = t == eos_token_id
                eos_idx = jnp.argmax(is_eos, axis=1)
                has_eos = jnp.any(is_eos, axis=1) & (eos_idx < m)
                m = jnp.where(has_eos, eos_idx + 1, m)
            else:
                has_eos = jnp.zeros((B,), bool)
            m = jnp.where(fin, 0, m)

            # --- write the window of target tokens into the buffer at
            # pos (rows re-decided later get overwritten — the same
            # coverage rule as the KV rows)
            def row(bf, tw, p, f):
                old = jax.lax.dynamic_slice(bf, (p,), (W,))
                return jax.lax.dynamic_update_slice(
                    bf, jnp.where(f, old, tw), (p,))

            buf = jax.vmap(row)(buf, t, pos, fin)
            cur = jnp.take_along_axis(
                t, jnp.maximum(m - 1, 0)[:, None], axis=1)
            cur = jnp.where(fin[:, None], c[1], cur)
            accepted = accepted + jnp.sum(jnp.where(fin, 0, m))
            hist = hist + jnp.sum(
                jax.nn.one_hot(m, kk + 2, dtype=jnp.int32), axis=0)
            pos = pos + m
            fin = fin | has_eos | (pos - P >= mnt)
            return pos, cur, buf, caches, fin, rounds + 1, accepted, hist

        (pos, _cur, buf, _caches, _fin, rounds, accepted,
         hist) = jax.lax.while_loop(
            cond, body,
            (pos0, cur0, buf0, caches, fin0, jnp.int32(0), jnp.int32(0),
             jnp.zeros((kk + 2,), jnp.int32)))

        # greedy_search tail semantics (same epilogue as
        # speculative_greedy_search)
        out = jax.lax.dynamic_slice_in_dim(buf, P, mnt + W, 1)
        idx = jnp.arange(mnt + W)[None, :]
        decided = pos - P
        maxc = jnp.minimum(jnp.max(decided), mnt)
        if eos_token_id is not None:
            lastpos = jnp.maximum(decided - 1, 0)
            last = jnp.take_along_axis(out, lastpos[:, None], axis=1)[:, 0]
            pad = jnp.where((last == eos_token_id)[:, None] & (idx < maxc),
                            eos_token_id, 0)
        else:
            pad = jnp.zeros((B, mnt + W), jnp.int32)
        out = jnp.where(idx < decided[:, None], out, pad)[:, :mnt]
        return (jnp.concatenate([input_ids, out], axis=1), rounds,
                accepted, hist)

    go = _cached_program(model, ("pld", eos_token_id), gd,
                         lambda: _pld_go)
    seq, rounds, accepted, hist = go(state, input_ids, caches,
                                     max_new_tokens, k, n)
    if return_stats:
        r = max(int(rounds), 1)
        import numpy as np

        return seq, {"rounds": int(rounds),
                     "tokens_per_round": float(accepted) / r / B,
                     "accept_hist": np.asarray(hist).tolist()}
    return seq
