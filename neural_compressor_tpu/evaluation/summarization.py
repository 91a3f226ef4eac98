"""Summarization evaluation harness (hf_eval counterpart).

Parity target: ``neural_compressor/evaluation/hf_eval/evaluator.py`` —
the reference beam-searches cnn_dailymail summaries and reports HF
``evaluate`` rouge percentages (rouge1/rouge2/rougeL/rougeLsum). Offline
here: ROUGE is computed from scratch (word n-gram F1 + LCS), the corpus
is any (source, target) text pairs — an in-repo lead-sentence corpus
built from the repository's own markdown is provided for self-contained
runs — and generation goes through this framework's jitted beam search.

    res = summarization_evaluate(qmodel, ByteTokenizer(),
                                 *repo_summarization_pairs(16))
    # {"rouge1": 31.2, "rouge2": ..., "rougeL": ..., "rougeLsum": ...}
"""

from __future__ import annotations

import os
import re

import jax.numpy as jnp
import numpy as np

from .tasks import rouge_l


def _words(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def rouge_n(pred: str, ref: str, n: int) -> float:
    """ROUGE-N F1 (word n-gram overlap with clipped counts)."""
    pw, rw = _words(pred), _words(ref)
    pg = [tuple(pw[i:i + n]) for i in range(len(pw) - n + 1)]
    rg = [tuple(rw[i:i + n]) for i in range(len(rw) - n + 1)]
    if not pg or not rg:
        return 0.0
    counts: dict = {}
    for g in rg:
        counts[g] = counts.get(g, 0) + 1
    match = 0
    for g in pg:
        if counts.get(g, 0) > 0:
            counts[g] -= 1
            match += 1
    p, r = match / len(pg), match / len(rg)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def postprocess_text(preds, targets):
    """Newline-per-sentence formatting for rougeLsum (the reference's
    hf_datasets/cnn_dailymail.py postprocess_text does the same with
    nltk.sent_tokenize)."""
    split = lambda t: "\n".join(  # noqa: E731
        s.strip() for s in re.split(r"(?<=[.!?])\s+", t.strip()) if s)
    return [split(p) for p in preds], [split(t) for t in targets]


def _rouge_lsum(pred: str, ref: str) -> float:
    """ROUGE-Lsum: union-LCS over sentence splits (lines)."""
    ref_lines = [_words(line) for line in ref.split("\n") if line.strip()]
    pred_lines = [_words(line) for line in pred.split("\n") if line.strip()]
    if not ref_lines or not pred_lines:
        return 0.0
    # summary-level LCS: per reference sentence, union of LCS hits
    # against all prediction sentences (greedy word-level union)
    total_match, total_p, total_r = 0, sum(map(len, pred_lines)), \
        sum(map(len, ref_lines))
    for rl in ref_lines:
        hit = set()
        for pl in pred_lines:
            hit.update(_lcs_indices(rl, pl))
        total_match += len(hit)
    if total_p == 0 or total_r == 0:
        return 0.0
    p, r = min(total_match, total_p) / total_p, total_match / total_r
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def _lcs_indices(ref: list, pred: list) -> set:
    """Indices of ref words on an LCS path with pred."""
    m, n = len(ref), len(pred)
    dp = np.zeros((m + 1, n + 1), dtype=np.int32)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i, j] = dp[i - 1, j - 1] + 1 if ref[i - 1] == pred[j - 1] \
                else max(dp[i - 1, j], dp[i, j - 1])
    idx, i, j = set(), m, n
    while i > 0 and j > 0:
        if ref[i - 1] == pred[j - 1] and dp[i, j] == dp[i - 1, j - 1] + 1:
            idx.add(i - 1)
            i, j = i - 1, j - 1
        elif dp[i - 1, j] >= dp[i, j - 1]:
            i -= 1
        else:
            j -= 1
    return idx


def rouge_scores(predictions, references) -> dict:
    """rouge1/rouge2/rougeL/rougeLsum as percentages rounded to 4 places
    — the reference evaluator's output shape (hf_eval/evaluator.py:81-84)."""
    r1 = [rouge_n(p, r, 1) for p, r in zip(predictions, references)]
    r2 = [rouge_n(p, r, 2) for p, r in zip(predictions, references)]
    rl = [rouge_l(_words(p), _words(r))
          for p, r in zip(predictions, references)]
    pp, rr = postprocess_text(predictions, references)
    rls = [_rouge_lsum(p, r) for p, r in zip(pp, rr)]
    mean = lambda xs: round(float(np.mean(xs)) * 100, 4) if xs else 0.0
    return {"rouge1": mean(r1), "rouge2": mean(r2), "rougeL": mean(rl),
            "rougeLsum": mean(rls)}


def repo_summarization_pairs(n: int = 16, min_words: int = 40):
    """Offline (source, target) corpus: repo markdown paragraphs with
    their lead sentence as the reference summary (the classic LEAD
    baseline task) — self-contained stand-in for cnn_dailymail."""
    from .corpus import REPO_ROOT

    sources, targets = [], []
    for name in sorted(os.listdir(REPO_ROOT)):
        if not name.endswith(".md"):
            continue
        with open(os.path.join(REPO_ROOT, name), errors="ignore") as f:
            text = f.read()
        for para in text.split("\n\n"):
            para = " ".join(para.split())
            if len(para.split()) < min_words or para.startswith(("#", "|",
                                                                 "-", "`")):
                continue
            sentences = re.split(r"(?<=[.!?])\s+", para)
            if len(sentences) < 2:
                continue
            sources.append(para)
            targets.append(sentences[0])
            if len(sources) >= n:
                return sources, targets
    return sources, targets


def summarization_evaluate(model, tokenizer, sources, targets,
                           num_beams: int = 4, max_new_tokens: int = 64,
                           max_source_len: int = 512,
                           limit: int | None = None) -> dict:
    """Beam-search a summary per source; return rouge percentages.

    Reference: hf_eval/evaluator.py:34 summarization_evaluate (beam 4,
    max_new_tokens 128 on cnn_dailymail)."""
    from ..generation import beam_search, greedy_search

    if limit is not None:
        sources, targets = sources[:limit], targets[:limit]
    preds = []
    eos = getattr(tokenizer, "eos_token_id", None)
    for src in sources:
        ids = tokenizer(src)["input_ids"][:max_source_len]
        ids = jnp.asarray(ids, dtype=jnp.int32)[None]
        if num_beams <= 1:
            out = greedy_search(model, ids, max_new_tokens=max_new_tokens,
                                eos_token_id=eos)
        else:
            out = beam_search(model, ids, num_beams=num_beams,
                              max_new_tokens=max_new_tokens,
                              eos_token_id=eos)
        preds.append(tokenizer.decode(np.asarray(out)[0, ids.shape[1]:]))
    return rouge_scores(preds, list(targets))
