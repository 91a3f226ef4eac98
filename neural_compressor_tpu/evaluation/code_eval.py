"""Code-generation evaluation harness (bigcode-eval counterpart).

Parity target: ``neural_compressor/evaluation/bigcode_eval/evaluator.py``
— the reference wraps the external bigcode-eval package (task selection by
fnmatch pattern, n-sample generation, intermediate-generation save/load,
execution-based pass@k). This environment is offline, so the harness is
self-contained: tasks are prompt/test pairs (an in-repo mini-suite is
provided), generation runs through this framework's jitted sampling loops,
and candidates execute in an isolated subprocess (fresh interpreter,
wall-clock timeout) scored with the unbiased pass@k estimator.

    tasks = builtin_tasks()                      # or your own CodeTask list
    ev = CodeEvaluator(model, tokenizer)
    results = ev.evaluate(tasks, n_samples=20, k=(1, 10))
"""

from __future__ import annotations

import dataclasses
import fnmatch
import json
import math
import os

import jax.numpy as jnp
import numpy as np

from .tasks import _run_candidate


class ByteTokenizer:
    """Byte-level tokenizer for the in-repo accuracy models (vocab 256).

    Implements the minimal HF-tokenizer surface the eval adapters use
    (callable encode, ``decode``, eos/pad ids — eos is byte 0, which the
    text corpus never contains)."""

    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text: str, **_kw):
        return {"input_ids": list(text.encode("utf-8", errors="ignore"))}

    def decode(self, ids, skip_special_tokens: bool = True):
        ids = [int(t) for t in np.asarray(ids).reshape(-1)]
        if skip_special_tokens:
            ids = [t for t in ids if t != self.eos_token_id]
        return bytes(ids).decode("utf-8", errors="ignore")


@dataclasses.dataclass
class CodeTask:
    """One functional-correctness problem: the model completes ``prompt``
    and the candidate (prompt + completion, cut at ``stop_words``) must
    pass ``test`` (assert-style snippet) when executed."""

    name: str
    prompt: str
    test: str
    stop_words: tuple = ("\ndef ", "\nclass ", "\nif __", "\nprint(")


# In-repo mini-suite (original problems, humaneval-style *shape*): small
# enough to run offline, real enough that execution-based scoring is
# exercised end to end. Real deployments pass their own CodeTask lists.
_BUILTIN = [
    ("add_two", "def add_two(a, b):\n    \"\"\"Return a + b.\"\"\"\n",
     "assert add_two(2, 3) == 5\nassert add_two(-1, 1) == 0\n"),
    ("double_list",
     "def double_list(xs):\n    \"\"\"Return xs with every element "
     "doubled.\"\"\"\n",
     "assert double_list([1, 2]) == [2, 4]\nassert double_list([]) == []\n"),
    ("count_vowels",
     "def count_vowels(s):\n    \"\"\"Return the number of vowels "
     "(aeiou) in s.\"\"\"\n",
     "assert count_vowels('hello') == 2\nassert count_vowels('xyz') == 0\n"),
    ("reverse_words",
     "def reverse_words(s):\n    \"\"\"Reverse the order of words in "
     "s.\"\"\"\n",
     "assert reverse_words('a b c') == 'c b a'\n"),
    ("max_diff",
     "def max_diff(xs):\n    \"\"\"Return max(xs) - min(xs).\"\"\"\n",
     "assert max_diff([3, 1, 9]) == 8\nassert max_diff([5]) == 0\n"),
    ("is_palindrome",
     "def is_palindrome(s):\n    \"\"\"True when s reads the same "
     "reversed.\"\"\"\n",
     "assert is_palindrome('abba')\nassert not is_palindrome('abc')\n"),
    ("fib",
     "def fib(n):\n    \"\"\"n-th Fibonacci number, fib(0) == 0.\"\"\"\n",
     "assert fib(0) == 0\nassert fib(1) == 1\nassert fib(10) == 55\n"),
    ("flatten",
     "def flatten(xss):\n    \"\"\"Flatten one level of nesting.\"\"\"\n",
     "assert flatten([[1], [2, 3]]) == [1, 2, 3]\n"),
]


def builtin_tasks() -> list[CodeTask]:
    return [CodeTask(name=n, prompt=p, test=t) for n, p, t in _BUILTIN]


def pattern_match(patterns, source_list) -> list[str]:
    """Task names matching at least one fnmatch pattern (reference
    bigcode_eval/evaluator.py:34)."""
    names = set()
    for pattern in patterns:
        names.update(fnmatch.filter(source_list, pattern))
    return sorted(names)


def select_tasks(tasks: list[CodeTask], patterns) -> list[CodeTask]:
    if patterns is None:
        return list(tasks)
    if isinstance(patterns, str):
        patterns = patterns.split(",")
    keep = set(pattern_match(patterns, [t.name for t in tasks]))
    return [t for t in tasks if t.name in keep]


def _truncate_at(text: str, stop_words) -> str:
    cut = len(text)
    for stop in stop_words:
        idx = text.find(stop)
        if idx >= 0:
            cut = min(cut, idx)
    return text[:cut]


def pass_at_k(n: int, c: int, k: int) -> float:
    """Unbiased pass@k: 1 - C(n-c, k)/C(n, k) (Codex-paper estimator)."""
    if c == 0:
        return 0.0
    if n - c < k:
        return 1.0
    return 1.0 - math.comb(n - c, k) / math.comb(n, k)


class CodeEvaluator:
    """Generate → (optionally save/reload) → execute → pass@k.

    Mirrors the reference evaluator's lifecycle: ``generation_only`` runs
    produce a JSON file of candidates per task that a later ``evaluate``
    call reloads via ``load_generations`` — the exact split the reference
    exposes through --generation_only / --load_generations_path."""

    def __init__(self, model, tokenizer, max_new_tokens: int = 128,
                 temperature: float = 0.8, top_p: float = 0.95,
                 timeout: float = 15.0, max_len: int | None = None):
        self.model = model
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.top_p = top_p
        self.timeout = timeout
        self.max_len = max_len

    def _generate_one(self, prompt_ids, seed: int, greedy: bool) -> str:
        from ..generation import greedy_search, sample

        ids = jnp.asarray(prompt_ids, dtype=jnp.int32)[None]
        if greedy:
            out = greedy_search(self.model, ids,
                                max_new_tokens=self.max_new_tokens,
                                max_len=self.max_len)
        else:
            out = sample(self.model, ids, max_new_tokens=self.max_new_tokens,
                         temperature=self.temperature, top_p=self.top_p,
                         seed=seed, max_len=self.max_len)
        return self.tokenizer.decode(np.asarray(out)[0, len(prompt_ids):])

    def generate_text(self, tasks: list[CodeTask], n_samples: int = 1,
                      intermediate_generations=None):
        """list (per task) of ``n_samples`` candidate programs (prompt +
        truncated completion). ``intermediate_generations`` (per-task
        candidate lists, possibly empty) are kept and only the missing
        tail is generated — the reference's resume mechanism."""
        outs = []
        for ti, task in enumerate(tasks):
            have = []
            if intermediate_generations and ti < len(
                    intermediate_generations):
                have = list(intermediate_generations[ti] or [])
            prompt_ids = self.tokenizer(task.prompt)["input_ids"]
            for s in range(len(have), n_samples):
                greedy = n_samples == 1 and self.temperature == 0.0
                text = self._generate_one(prompt_ids, seed=1000 * ti + s,
                                          greedy=greedy)
                have.append(task.prompt + _truncate_at(text,
                                                       task.stop_words))
            outs.append(have[:n_samples])
        return outs

    @staticmethod
    def save_json_files(generations, references, gen_path: str,
                        ref_path: str | None = None) -> None:
        with open(gen_path, "w") as f:
            json.dump(generations, f)
        if ref_path:
            with open(ref_path, "w") as f:
                json.dump(references, f)

    @staticmethod
    def load_generations(path: str):
        with open(path) as f:
            return json.load(f)

    def evaluate(self, tasks, patterns=None, n_samples: int = 1,
                 k=(1,), generation_only: bool = False,
                 save_generations_path: str | None = None,
                 load_generations_path: str | None = None,
                 intermediate_generations=None) -> dict:
        """Returns {"<task>": {"pass@k": ...}, "pass@k": mean, ...} (or
        just writes candidates when ``generation_only``)."""
        tasks = select_tasks(tasks, patterns)
        if load_generations_path:
            generations = self.load_generations(load_generations_path)
        else:
            generations = self.generate_text(
                tasks, n_samples=n_samples,
                intermediate_generations=intermediate_generations)
        if save_generations_path:
            base, ext = os.path.splitext(save_generations_path)
            self.save_json_files(generations, [t.test for t in tasks],
                                 save_generations_path,
                                 base + "_references" + (ext or ".json"))
        if generation_only:
            return {"generations": generations}

        ks = (k,) if isinstance(k, int) else tuple(k)
        results: dict = {}
        per_k = {kk: [] for kk in ks}
        for task, cands in zip(tasks, generations):
            n = len(cands)
            c = sum(_run_candidate(code, task.test, self.timeout)
                    for code in cands)
            results[task.name] = {"n": n, "correct": c}
            for kk in ks:
                score = pass_at_k(n, c, min(kk, n))
                results[task.name][f"pass@{kk}"] = score
                per_k[kk].append(score)
        for kk in ks:
            results[f"pass@{kk}"] = float(np.mean(per_k[kk])) \
                if per_k[kk] else 0.0
        return results
