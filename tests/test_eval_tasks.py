"""Generation-task evals: exact-match, executed pass@k, ROUGE-L.

Reference: evaluation/bigcode_eval wrapper + lm-eval summarization tasks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from neural_compressor_tpu.evaluation import (
    code_pass_at_k, exact_match_generation, rouge_l, summarization_rouge)
from neural_compressor_tpu.models import LlamaForCausalLM


def test_rouge_l_properties():
    assert rouge_l([1, 2, 3], [1, 2, 3]) == 1.0
    assert rouge_l([1, 2, 3], [4, 5, 6]) == 0.0
    mid = rouge_l([1, 9, 2, 8, 3], [1, 2, 3])
    assert 0.0 < mid < 1.0


@pytest.mark.slow
def test_code_pass_at_k_executes():
    tasks = [
        # one passing, one failing candidate
        ["def add(a, b):\n    return a + b\n",
         "def add(a, b):\n    return a - b\n"],
        # always fails (raises)
        ["def mul(a, b):\n    raise RuntimeError\n"],
    ]
    tests = ["assert add(2, 3) == 5", "assert mul(2, 3) == 6"]
    p1 = code_pass_at_k(tasks, tests, k=1)
    p2 = code_pass_at_k(tasks, tests, k=2)
    # task 1: 1/2 candidates pass -> pass@1 = .5, pass@2 = 1; task 2: 0
    assert abs(p1 - 0.25) < 1e-9, p1
    assert abs(p2 - 0.5) < 1e-9, p2


def test_exact_match_and_rouge_on_model():
    m = LlamaForCausalLM.from_preset("llama-test")
    rng = np.random.default_rng(0)
    ctx = [rng.integers(0, 256, (6,)).tolist() for _ in range(2)]
    # self-consistency: references = the model's own greedy continuations
    from neural_compressor_tpu.generation import greedy_search

    refs = []
    for c in ctx:
        out = greedy_search(m, jnp.asarray(c, dtype=jnp.int32)[None],
                            max_new_tokens=4)
        refs.append(np.asarray(out)[0, len(c):].tolist())
    assert exact_match_generation(m, ctx, refs) == 1.0
    assert summarization_rouge(m, ctx, refs, max_new_tokens=4) == 1.0
    # perturbed references score below 1
    bad = [[(t + 1) % 256 for t in r] for r in refs]
    assert exact_match_generation(m, ctx, bad) == 0.0
