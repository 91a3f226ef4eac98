"""Continuous-batching serving engine for (quantized) causal LMs.

The north-star serving loop (BASELINE.json): a fixed pool of decode slots
shares one jitted decode program; requests prefill into a free slot on
arrival and retire independently at EOS/limit, so the batch stays full
without global synchronization. The reference delegates serving to external
stacks (vLLM/Gaudi); this is our native equivalent.

Design (TPU):
  * one KV cache of [n_slots, H, T, D] per layer; per-slot positions go to
    the fused decode-attention kernel (pos is a [B] array)
  * the decode step is ONE jit call for all slots, every iteration —
    finished/empty slots decode garbage that is simply ignored (masked on
    the host), keeping shapes static
  * prefill runs per request at a handful of bucketed lengths (pad to
    bucket) and writes that slot's cache rows
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..common import logger
from ..models.llama import init_kv_cache


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray            # [P] int32
    max_new_tokens: int = 64
    # filled during serving
    generated: list = dataclasses.field(default_factory=list)
    done: bool = False


def _buckets(n, sizes=(32, 64, 128, 256, 512, 1024, 2048)):
    for s in sizes:
        if n <= s:
            return s
    raise ValueError(f"prompt length {n} exceeds the largest prefill "
                     f"bucket ({sizes[-1]})")


class ContinuousBatchingEngine:
    def __init__(self, model, n_slots: int = 8, max_len: int = 1024,
                 eos_token_id: int | None = None):
        self.model = model
        self.cfg = model.cfg
        self.n_slots = n_slots
        self.max_len = max_len
        self.eos_token_id = eos_token_id
        quantized = (getattr(model, "kv_cache_format", "int8")
                 if getattr(model, "kv_cache_quantized", False) else False)
        self.caches = init_kv_cache(self.cfg, n_slots, max_len,
                                    quantized=quantized)
        self._graphdef, self._state = nnx.split(model)
        self._uid = itertools.count()
        # slot bookkeeping (host side)
        self.slot_req: list[Request | None] = [None] * n_slots
        self.slot_pos = np.zeros((n_slots,), np.int32)   # next write index
        self.slot_tok = np.zeros((n_slots,), np.int32)   # last token
        self.queue: list[Request] = []
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------ api
    def submit(self, prompt_ids, max_new_tokens: int = 64) -> Request:
        prompt = np.asarray(prompt_ids, np.int32)
        assert prompt.ndim == 1, "submit() takes a single unbatched prompt"
        assert len(prompt) + max_new_tokens <= self.max_len, (
            f"prompt ({len(prompt)}) + max_new_tokens ({max_new_tokens}) "
            f"exceeds max_len ({self.max_len})")
        req = Request(next(self._uid), prompt, max_new_tokens)
        self.queue.append(req)
        return req

    def run(self, max_steps: int = 10_000,
            chunk: int = 8) -> list[Request]:
        """Serve until queue and slots drain. ``chunk`` decode steps run
        per device dispatch (amortizes host/link round-trips; slots that
        hit EOS mid-chunk are truncated on the host). Returns finished
        requests."""
        finished = []
        for _ in range(max_steps):
            self._fill_slots()
            if all(r is None for r in self.slot_req) and not self.queue:
                break
            self.step_many(chunk)
            finished.extend(self._collect())
        return finished

    # ------------------------------------------------------------- internals
    def _prefill_fn(self, P):
        key = ("prefill", P)
        if key not in self._jit_cache:
            graphdef = self._graphdef

            @jax.jit
            def prefill(state, caches, ids, slot, true_len):
                m = nnx.merge(graphdef, state)
                positions = jnp.arange(P)[None, :]
                # slice this slot's cache rows, run, write back
                sub = jax.tree.map(lambda c: jax.lax.dynamic_slice_in_dim(
                    c, slot, 1, axis=0), caches)
                logits, sub = m(ids[None, :], positions=positions,
                                caches=sub, cache_pos=0)
                caches = jax.tree.map(
                    lambda c, s: jax.lax.dynamic_update_slice_in_dim(
                        c, s, slot, axis=0), caches, sub)
                nxt = jnp.argmax(logits[0, true_len - 1], axis=-1)
                return caches, nxt

            self._jit_cache[key] = prefill
        return self._jit_cache[key]

    def _decode_fn(self):
        key = "decode"
        if key not in self._jit_cache:
            graphdef = self._graphdef

            @jax.jit
            def decode(state, caches, toks, pos):
                m = nnx.merge(graphdef, state)
                logits, caches = m(toks[:, None], positions=pos[:, None],
                                   caches=caches, cache_pos=pos)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                return caches, nxt

            self._jit_cache[key] = decode
        return self._jit_cache[key]

    def _decode_many_fn(self, k: int):
        key = ("decode_many", k)
        if key not in self._jit_cache:
            graphdef = self._graphdef

            @jax.jit
            def decode_many(state, caches, toks, pos):
                m = nnx.merge(graphdef, state)

                def body(i, carry):
                    toks, pos, caches, out = carry
                    logits, caches = m(toks[:, None],
                                       positions=pos[:, None],
                                       caches=caches, cache_pos=pos)
                    nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                    out = jax.lax.dynamic_update_slice(
                        out, nxt[:, None], (0, i))
                    return nxt, pos + 1, caches, out

                out0 = jnp.zeros((toks.shape[0], k), jnp.int32)
                _t, _p, caches, out = jax.lax.fori_loop(
                    0, k, body, (toks, pos, caches, out0))
                return caches, out

            self._jit_cache[key] = decode_many
        return self._jit_cache[key]

    def _fill_slots(self):
        for slot in range(self.n_slots):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            P = len(req.prompt)
            bucket = _buckets(P)
            ids = np.zeros((bucket,), np.int32)
            ids[:P] = req.prompt
            prefill = self._prefill_fn(bucket)
            self.caches, nxt = prefill(self._state, self.caches,
                                       jnp.asarray(ids), slot, P)
            tok = int(nxt)
            req.generated.append(tok)
            self.slot_req[slot] = req
            self.slot_pos[slot] = P
            self.slot_tok[slot] = tok
            logger.debug("slot %d <- request %d (P=%d)", slot, req.uid, P)

    def step(self):
        decode = self._decode_fn()
        toks = jnp.asarray(self.slot_tok)
        pos = jnp.asarray(self.slot_pos)
        self.caches, nxt = decode(self._state, self.caches, toks, pos)
        nxt = np.asarray(nxt)
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            self.slot_pos[slot] += 1
            tok = int(nxt[slot])
            req.generated.append(tok)
            self.slot_tok[slot] = tok
            if ((self.eos_token_id is not None and tok == self.eos_token_id)
                    or len(req.generated) >= req.max_new_tokens
                    or self.slot_pos[slot] >= self.max_len - 1):
                req.done = True

    def step_many(self, k: int = 8):
        """Decode ``k`` tokens for every active slot in one dispatch."""
        if k <= 1:
            return self.step()
        decode_many = self._decode_many_fn(k)
        toks = jnp.asarray(self.slot_tok)
        pos = jnp.asarray(self.slot_pos)
        self.caches, out = decode_many(self._state, self.caches, toks, pos)
        out = np.asarray(out)  # [n_slots, k]
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            for j in range(k):
                if req.done:
                    break
                self.slot_pos[slot] += 1
                tok = int(out[slot, j])
                req.generated.append(tok)
                self.slot_tok[slot] = tok
                if ((self.eos_token_id is not None
                     and tok == self.eos_token_id)
                        or len(req.generated) >= req.max_new_tokens
                        or self.slot_pos[slot] >= self.max_len - 1):
                    req.done = True

    def _collect(self):
        done = []
        for slot, req in enumerate(self.slot_req):
            if req is not None and req.done:
                done.append(req)
                self.slot_req[slot] = None
        return done
