"""Generation-task evaluation: code-eval and summarization analogs.

Parity target: the reference's evaluation extras — bigcode-eval wrapper
(neural_compressor/evaluation/bigcode_eval/) for code pass@k and the
lm-eval summarization/rouge tasks its recipes report. This build is
offline: tasks evaluate on user-supplied prompt/reference pairs.

  * ``exact_match_generation`` — greedy-decode prompts, compare to
    reference continuations (the deterministic slice of code-eval).
  * ``code_pass_at_k`` — EXECUTE generated python candidates against a
    test snippet in an isolated subprocess and report pass@k (the
    bigcode functional-correctness metric).
  * ``rouge_l`` / ``summarization_rouge`` — LCS-based ROUGE-L for
    generate-until summarization tasks.
"""

from __future__ import annotations

import math
import subprocess
import sys

import jax.numpy as jnp
import numpy as np


def exact_match_generation(model, prompts, references,
                           max_new_tokens: int | None = None) -> float:
    """Greedy-decode each prompt; score 1 when the generated ids equal the
    reference continuation ids. ``prompts``/``references``: lists of int
    sequences."""
    from ..generation import greedy_search

    hits = 0
    for ctx, ref in zip(prompts, references):
        mnt = max_new_tokens or len(ref)
        out = greedy_search(model, jnp.asarray(ctx, dtype=jnp.int32)[None],
                            max_new_tokens=mnt)
        gen = np.asarray(out)[0, len(ctx):len(ctx) + len(ref)]
        hits += int(np.array_equal(gen, np.asarray(ref)))
    return hits / max(len(prompts), 1)


_RUNNER = """
import sys
candidate = sys.stdin.read()
ns = {}
try:
    exec(candidate, ns)
except Exception:
    sys.exit(2)
sys.exit(0)
"""


def _run_candidate(code: str, test_code: str, timeout: float) -> bool:
    """Execute candidate+tests in a separate python process (isolation:
    fresh interpreter, wall-clock timeout; the reference shells out to
    bigcode-eval's execution sandbox the same way)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _RUNNER],
            input=(code + "\n\n" + test_code).encode(),
            timeout=timeout, capture_output=True)
        return proc.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def code_pass_at_k(candidates_per_task, tests, k: int = 1,
                   timeout: float = 30.0) -> float:
    """bigcode pass@k over executed candidates.

    ``candidates_per_task``: list (per task) of lists of candidate code
    strings; ``tests``: per-task test snippets (assert-style). Uses the
    unbiased estimator  1 - C(n-c, k)/C(n, k).
    """
    scores = []
    for cands, test in zip(candidates_per_task, tests):
        n = len(cands)
        c = sum(_run_candidate(code, test, timeout) for code in cands)
        if c == 0:
            scores.append(0.0)
        elif n - c < k:
            scores.append(1.0)
        else:
            scores.append(1.0 - math.comb(n - c, k) / math.comb(n, k))
    return float(np.mean(scores)) if scores else 0.0


def rouge_l(pred_tokens, ref_tokens) -> float:
    """ROUGE-L F1 over token sequences (LCS-based)."""
    a, b = list(pred_tokens), list(ref_tokens)
    if not a or not b:
        return 0.0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    lcs = dp[len(b)]
    p = lcs / len(a)
    r = lcs / len(b)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def summarization_rouge(model, prompts, references,
                        max_new_tokens: int = 64,
                        eos_token_id: int | None = None) -> float:
    """Mean ROUGE-L of greedy summaries vs references (token ids)."""
    from ..generation import greedy_search

    scores = []
    for ctx, ref in zip(prompts, references):
        out = greedy_search(model, jnp.asarray(ctx, dtype=jnp.int32)[None],
                            max_new_tokens=max_new_tokens,
                            eos_token_id=eos_token_id)
        gen = list(np.asarray(out)[0, len(ctx):])
        if eos_token_id is not None and eos_token_id in gen:
            gen = gen[: gen.index(eos_token_id)]
        scores.append(rouge_l(gen, ref))
    return float(np.mean(scores)) if scores else 0.0
