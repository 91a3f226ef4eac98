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
