"""LM evaluation harness: perplexity, next-token and lambada-style accuracy.

Parity target: the reference's evaluation package
(neural_compressor/evaluation/lm_eval/ — a wrapper over EleutherAI
lm-eval-harness with an INC-tolerant HF adapter). This build is offline:
the harness evaluates on **user-supplied token arrays** with fully jitted
scoring loops (one compile per shape), covering the metrics the reference's
recipes report (lambada_openai acc, wikitext ppl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..common import logger


def _batches(ids: np.ndarray, batch_size: int):
    for i in range(0, len(ids), batch_size):
        yield jnp.asarray(ids[i:i + batch_size])


def _split_fn(model):
    graphdef, state = nnx.split(model)

    @jax.jit
    def logits_fn(state, batch):
        return nnx.merge(graphdef, state)(batch)

    return state, logits_fn


@functools.partial(jax.jit, static_argnames=())
def _nll_and_hits(logits, targets, mask):
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt_lp = jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    nll = -(tgt_lp * mask).sum()
    hits = ((jnp.argmax(logits, axis=-1) == targets) * mask).sum()
    return nll, hits, mask.sum()


def evaluate_lm(model, token_ids: np.ndarray, batch_size: int = 8,
                pad_id: int = -1) -> dict:
    """Teacher-forced eval over ``token_ids [n, seq]``.

    Returns {"ppl", "next_token_acc", "n_tokens"}; positions equal to
    ``pad_id`` are ignored."""
    state, logits_fn = _split_fn(model)
    tot_nll = 0.0
    tot_hits = 0.0
    tot_cnt = 0.0
    for batch in _batches(np.asarray(token_ids), batch_size):
        logits = logits_fn(state, batch)[:, :-1]
        targets = batch[:, 1:]
        mask = (targets != pad_id).astype(jnp.float32)
        targets = jnp.maximum(targets, 0)
        nll, hits, cnt = _nll_and_hits(logits, targets, mask)
        tot_nll += float(nll)
        tot_hits += float(hits)
        tot_cnt += float(cnt)
    ppl = float(np.exp(tot_nll / max(tot_cnt, 1.0)))
    acc = tot_hits / max(tot_cnt, 1.0)
    logger.info("eval: ppl %.4f, next-token acc %.4f over %d tokens",
                ppl, acc, int(tot_cnt))
    return {"ppl": ppl, "next_token_acc": acc, "n_tokens": int(tot_cnt)}


def perplexity(model, token_ids: np.ndarray, batch_size: int = 8) -> float:
    return evaluate_lm(model, token_ids, batch_size)["ppl"]


def decode_perplexity(model, token_ids: np.ndarray, batch_size: int = 8,
                      kv_quantized: bool | str = False) -> float:
    """Teacher-forced ppl through the DECODE path: one token per step
    with a KV cache, optionally quantized (``kv_quantized``: False |
    "int8" | "fp8_e4m3").

    With a bf16 cache this matches ``perplexity`` (the cache holds the
    exact keys/values the parallel attention recomputes); the delta under
    a quantized cache is the KV-quantization accuracy cost — the
    evidence the serving configs (int8/fp8 KV) are judged by. The
    reference measures its fp8 KV patches the same way (lm-eval over
    PatchedKVCache models, helper_modules.py:1105)."""
    from ..models.llama import init_kv_cache

    graphdef, state = nnx.split(model)
    S = int(np.asarray(token_ids).shape[1])
    # models may own their cache shapes (deepseek's MLA K/V widths /
    # latent rows) — same preference order as generation._alloc_caches
    init = getattr(model, "init_caches", None)

    @jax.jit
    def run(state, batch):
        B = batch.shape[0]
        caches = (init(B, S, quantized=kv_quantized) if init is not None
                  else init_kv_cache(model.cfg, B, S,
                                     quantized=kv_quantized))
        m = nnx.merge(graphdef, state)

        def step(caches, i):
            tok = jax.lax.dynamic_slice_in_dim(batch, i, 1, axis=1)
            pos = jnp.full((B, 1), i, dtype=jnp.int32)
            logits, caches = m(tok, positions=pos, caches=caches,
                               cache_pos=i)
            tgt = jax.lax.dynamic_slice_in_dim(batch, i + 1, 1, axis=1)
            lp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(lp, tgt, axis=-1).sum()
            return caches, nll

        _, nlls = jax.lax.scan(step, caches, jnp.arange(S - 1))
        return nlls.sum()

    tot_nll, tot_cnt = 0.0, 0
    for batch in _batches(np.asarray(token_ids), batch_size):
        tot_nll += float(run(state, batch))
        tot_cnt += batch.shape[0] * (S - 1)
    return float(np.exp(tot_nll / max(tot_cnt, 1)))


def next_token_accuracy(model, token_ids: np.ndarray,
                        batch_size: int = 8) -> float:
    return evaluate_lm(model, token_ids, batch_size)["next_token_acc"]


def lambada_style_accuracy(model, contexts: np.ndarray,
                           last_token: np.ndarray,
                           batch_size: int = 8) -> float:
    """Greedy last-word prediction accuracy (the lambada_openai metric the
    reference's recipe tables report — docs/source/llm_recipes.md)."""
    state, logits_fn = _split_fn(model)
    hits = 0
    for i in range(0, len(contexts), batch_size):
        batch = jnp.asarray(contexts[i:i + batch_size])
        tgt = np.asarray(last_token[i:i + batch_size])
        logits = logits_fn(state, batch)
        pred = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        hits += int((pred == tgt).sum())
    return hits / len(contexts)


def loglikelihood_from_ids(model, pairs, batch_size: int = 8,
                           max_len: int | None = None):
    """lm-eval-harness-style loglikelihood scoring on token ids.

    ``pairs``: list of (context_ids, continuation_ids) int sequences.
    Returns ``[(ll, is_greedy), ...]`` — summed log-prob of the
    continuation given the context, and whether the continuation equals the
    greedy decode (the two quantities lm-eval's accuracy/perplexity tasks
    consume; reference adapter: evaluation/lm_eval/models/huggingface.py).
    """
    lens = [len(c) + len(t) for c, t in pairs]
    L = max_len or max(lens)
    results = []
    state, logits_fn = _split_fn(model)  # one jit cache for every batch
    for i in range(0, len(pairs), batch_size):
        chunk = pairs[i:i + batch_size]
        B = len(chunk)
        ids = np.zeros((B, L), np.int64)
        cont_mask = np.zeros((B, L), np.float32)
        for r, (ctx, cont) in enumerate(chunk):
            seq = list(ctx) + list(cont)
            seq = seq[-L:]
            ids[r, :len(seq)] = seq
            # a continuation longer than L is itself left-truncated (the
            # lm-eval HF adapter's convention); clamp so the mask can't
            # wrap around to the sequence tail
            start = max(len(seq) - len(cont), 0)
            cont_mask[r, start:len(seq)] = 1.0
        logits = logits_fn(state, jnp.asarray(ids))[:, :-1]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.asarray(ids[:, 1:])
        tok_lp = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        m = jnp.asarray(cont_mask[:, 1:])
        lls = np.asarray((tok_lp * m).sum(axis=-1))
        greedy = np.asarray(
            ((jnp.argmax(logits, axis=-1) == tgt) | (m == 0)).all(axis=-1))
        results.extend(zip(lls.tolist(), greedy.tolist()))
    return results


try:  # subclass the real harness LM so simple_evaluate's isinstance passes
    from lm_eval.api.model import LM as _LMBase  # type: ignore
except Exception:  # harness not installed: plain duck-typed adapter
    _LMBase = object


class LMEvalAdapter(_LMBase):
    """Adapter for EleutherAI lm-eval-harness (when installed): implements
    the ``LM`` interface (loglikelihood / loglikelihood_rolling /
    generate_until) over this framework's models + a HF tokenizer.

    >>> import lm_eval
    >>> lm = LMEvalAdapter(qmodel, tokenizer)
    >>> lm_eval.simple_evaluate(model=lm, tasks=["lambada_openai"])
    """

    def __init__(self, model, tokenizer, batch_size: int = 8,
                 max_length: int = 2048):
        if _LMBase is not object:
            super().__init__()
        self.model = model
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length

    def _encode(self, text: str):
        return self.tokenizer(text, add_special_tokens=False)["input_ids"]

    def _encode_pair(self, context: str, continuation: str):
        whole = self._encode(context + continuation)
        ctx = self._encode(context)
        return ctx, whole[len(ctx):]

    @property
    def _prefix_token_id(self) -> int:
        tid = getattr(self.tokenizer, "bos_token_id", None)
        if tid is None:
            tid = getattr(self.tokenizer, "eos_token_id", None)
        return 0 if tid is None else int(tid)

    def loglikelihood(self, requests):
        pairs = []
        for req in requests:
            ctx, cont = (req.args if hasattr(req, "args") else req)
            if ctx:
                pairs.append(self._encode_pair(ctx, cont))
            else:  # unconditional ll: score from the prefix token
                pairs.append(([self._prefix_token_id], self._encode(cont)))
        return loglikelihood_from_ids(self.model, pairs,
                                      batch_size=self.batch_size,
                                      max_len=self.max_length)

    def loglikelihood_rolling(self, requests):
        """Full-text loglikelihood (wikitext-style ppl tasks): the text is
        scored over disjoint windows of ``max_length`` with one token of
        left context each (the harness's rolling-window convention)."""
        lls = []
        for req in requests:
            args = req.args if hasattr(req, "args") else (req,)
            toks = self._encode(args[0])
            step = self.max_length - 1
            pairs = []
            for i in range(0, len(toks), step):
                ctx = [self._prefix_token_id] if i == 0 else [toks[i - 1]]
                pairs.append((ctx, toks[i:i + step]))
            window_lls = loglikelihood_from_ids(
                self.model, pairs, batch_size=self.batch_size,
                max_len=self.max_length)
            lls.append(float(sum(ll for ll, _g in window_lls)))
        return lls

    def generate_until(self, requests):
        from ..generation import greedy_search

        outs = []
        eos = getattr(self.tokenizer, "eos_token_id", None)
        for req in requests:
            ctx, kwargs = (req.args if hasattr(req, "args") else req)
            kwargs = dict(kwargs or {})
            until = kwargs.get("until") or []
            if isinstance(until, str):
                until = [until]
            ids = self.tokenizer(ctx, return_tensors="np")["input_ids"]
            out = greedy_search(
                self.model, jnp.asarray(ids),
                max_new_tokens=int(kwargs.get("max_gen_toks", 256)),
                eos_token_id=eos)
            text = self.tokenizer.decode(np.asarray(out)[0, ids.shape[1]:],
                                         skip_special_tokens=True)
            # honor the task's stop sequences
            for stop in until:
                if stop:
                    text = text.split(stop)[0]
            outs.append(text)
        return outs
