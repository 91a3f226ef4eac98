"""Code-eval (pass@k) and summarization (rouge) harnesses.

Parity targets: neural_compressor/evaluation/bigcode_eval/evaluator.py
(task patterns, n-sample generation, save/load, execution pass@k) and
neural_compressor/evaluation/hf_eval/evaluator.py (beam summaries,
rouge1/2/L/Lsum percentages)."""

import json

import numpy as np
import pytest

from neural_compressor_tpu.evaluation.code_eval import (
    ByteTokenizer, CodeEvaluator, CodeTask, builtin_tasks, pass_at_k,
    pattern_match, select_tasks)
from neural_compressor_tpu.evaluation.summarization import (
    postprocess_text, repo_summarization_pairs, rouge_n, rouge_scores,
    summarization_evaluate)


def test_pass_at_k_estimator():
    # n=2, c=1, k=1 -> 0.5; all correct -> 1; none -> 0
    assert pass_at_k(2, 1, 1) == pytest.approx(0.5)
    assert pass_at_k(10, 10, 1) == 1.0
    assert pass_at_k(10, 0, 5) == 0.0
    # n=5, c=2, k=3: 1 - C(3,3)/C(5,3) = 1 - 1/10
    assert pass_at_k(5, 2, 3) == pytest.approx(0.9)
    # k > n - c -> certain hit
    assert pass_at_k(3, 1, 3) == 1.0


def test_pattern_match_and_select():
    names = ["fib", "flatten", "add_two", "max_diff"]
    assert pattern_match(["f*"], names) == ["fib", "flatten"]
    tasks = builtin_tasks()
    sel = select_tasks(tasks, "fib,add*")
    assert sorted(t.name for t in sel) == ["add_two", "fib"]
    assert select_tasks(tasks, None) == tasks


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok("def f(x):\n    return x")["input_ids"]
    assert all(0 <= t < 256 for t in ids)
    assert tok.decode(ids) == "def f(x):\n    return x"


def test_execution_scoring_without_model(tmp_path):
    """pass@k over canned generations (the load_generations path): a
    correct candidate, a wrong one, and a crasher."""
    tasks = [CodeTask(name="add_two",
                      prompt="def add_two(a, b):\n",
                      test="assert add_two(1, 2) == 3")]
    gens = [["def add_two(a, b):\n    return a + b\n",
             "def add_two(a, b):\n    return a - b\n",
             "def add_two(a, b):\n    raise RuntimeError()\n"]]
    path = tmp_path / "gens.json"
    path.write_text(json.dumps(gens))

    class NoModel:
        pass

    ev = CodeEvaluator(NoModel(), ByteTokenizer(), timeout=20.0)
    res = ev.evaluate(tasks, k=(1, 3), load_generations_path=str(path))
    assert res["add_two"]["correct"] == 1
    assert res["add_two"]["pass@1"] == pytest.approx(1 / 3)
    assert res["add_two"]["pass@3"] == 1.0
    assert res["pass@1"] == pytest.approx(1 / 3)


def test_generation_only_and_resume(tmp_path):
    """generation_only writes JSON; intermediate generations are kept and
    only the missing tail is generated (reference resume semantics)."""
    from neural_compressor_tpu.models.llama import LlamaForCausalLM

    model = LlamaForCausalLM.from_preset("llama-test")
    tasks = [CodeTask(name="t0", prompt="def f():\n", test="assert True")]
    ev = CodeEvaluator(model, ByteTokenizer(), max_new_tokens=4,
                       max_len=64)
    gen_path = tmp_path / "out.json"
    res = ev.evaluate(tasks, n_samples=2, generation_only=True,
                      save_generations_path=str(gen_path),
                      intermediate_generations=[["CANNED"]])
    gens = json.loads(gen_path.read_text())
    assert len(gens[0]) == 2
    assert gens[0][0] == "CANNED"  # kept, not regenerated
    assert gens[0][1].startswith("def f():\n")
    assert res["generations"] == gens
    assert (tmp_path / "out_references.json").exists()


def test_rouge_n_known_values():
    assert rouge_n("the cat sat", "the cat sat", 1) == pytest.approx(1.0)
    assert rouge_n("a b c", "x y z", 1) == 0.0
    # pred "the cat", ref "the cat sat": unigram P=1, R=2/3 -> F1=0.8
    assert rouge_n("the cat", "the cat sat", 1) == pytest.approx(0.8)
    assert rouge_n("", "x", 2) == 0.0


def test_rouge_scores_shape_and_postprocess():
    preds = ["The model runs fast. It is quantized."]
    refs = ["The model runs fast. Quantization keeps accuracy."]
    res = rouge_scores(preds, refs)
    assert set(res) == {"rouge1", "rouge2", "rougeL", "rougeLsum"}
    assert 0 < res["rouge1"] <= 100
    assert res["rouge2"] <= res["rouge1"]
    pp, rr = postprocess_text(preds, refs)
    assert pp[0].count("\n") == 1  # two sentences -> one newline


def test_rouge_identical_is_100():
    text = ["quantized decoding keeps perplexity flat. throughput rises."]
    res = rouge_scores(text, list(text))
    for v in res.values():
        assert v == pytest.approx(100.0)


def test_repo_summarization_pairs():
    sources, targets = repo_summarization_pairs(4)
    assert len(sources) == len(targets) > 0
    for s, t in zip(sources, targets):
        assert t in s  # lead sentence comes from the paragraph


@pytest.mark.slow
def test_summarization_evaluate_end_to_end():
    """Pipeline smoke on the tiny test model: returns the reference's
    metric keys and the greedy path agrees with beam-1."""
    from neural_compressor_tpu.models.llama import LlamaForCausalLM

    model = LlamaForCausalLM.from_preset("llama-test")
    sources = ["alpha beta gamma delta. epsilon zeta.",
               "one two three four. five six."]
    targets = ["alpha beta gamma delta.", "one two three four."]
    res = summarization_evaluate(model, ByteTokenizer(), sources, targets,
                                 num_beams=2, max_new_tokens=8)
    assert set(res) == {"rouge1", "rouge2", "rougeL", "rougeLsum"}
    res1 = summarization_evaluate(model, ByteTokenizer(), sources, targets,
                                  num_beams=1, max_new_tokens=8, limit=1)
    assert set(res1) == {"rouge1", "rouge2", "rougeL", "rougeLsum"}
