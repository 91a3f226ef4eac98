"""LMEvalAdapter — the seam into the real EleutherAI lm-eval-harness
(reference counterpart: evaluation/lm_eval/models/huggingface.py — a
patched HF-model adapter). The harness is absent in this offline image,
so the battery covers (a) the duck-typed LM interface semantics against
in-repo ground truth and (b) the subclass path with a MOCKED
``lm_eval`` package injected before (re)import."""

import importlib
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from neural_compressor_tpu.evaluation import lm_eval as lme
from neural_compressor_tpu.models import LlamaForCausalLM


class ByteTokenizer:
    """Minimal HF-tokenizer stand-in over raw bytes (vocab 256)."""

    bos_token_id = 1
    eos_token_id = 0

    def __call__(self, text, add_special_tokens=False,
                 return_tensors=None):
        ids = list(text.encode("latin1"))
        if return_tensors == "np":
            return {"input_ids": np.asarray([ids], np.int32)}
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        return bytes(int(i) % 256 for i in np.asarray(ids).ravel()).decode(
            "latin1")


class _Req:
    """Harness-style request object carrying .args."""

    def __init__(self, *args):
        self.args = args


@pytest.fixture(scope="module")
def model():
    return LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)


@pytest.fixture(scope="module")
def adapter(model):
    return lme.LMEvalAdapter(model, ByteTokenizer(), batch_size=4,
                             max_length=64)


def test_loglikelihood_matches_ground_truth(adapter, model):
    """Adapter loglikelihood == direct loglikelihood_from_ids on the same
    (context, continuation) token pairs; tuple AND .args request forms."""
    reqs = [("hello ", "world"), ("abc", "def")]
    got = adapter.loglikelihood(reqs)
    got_obj = adapter.loglikelihood([_Req(*r) for r in reqs])
    tok = ByteTokenizer()
    pairs = [(tok(c)["input_ids"], tok(x)["input_ids"]) for c, x in reqs]
    ref = lme.loglikelihood_from_ids(model, pairs, batch_size=4,
                                     max_len=64)
    for (g_ll, g_greedy), (o_ll, _), (r_ll, r_greedy) in zip(got, got_obj,
                                                             ref):
        assert abs(g_ll - r_ll) < 1e-3, (g_ll, r_ll)
        assert abs(o_ll - r_ll) < 1e-3
        assert g_greedy == r_greedy


def test_loglikelihood_empty_context_uses_prefix_token(adapter, model):
    """Unconditional scoring starts from the BOS/prefix token (harness
    convention for pure-continuation requests)."""
    (ll, _), = adapter.loglikelihood([("", "xyz")])
    tok = ByteTokenizer()
    (ref_ll, _), = lme.loglikelihood_from_ids(
        model, [([ByteTokenizer.bos_token_id], tok("xyz")["input_ids"])],
        batch_size=4, max_len=64)
    assert abs(ll - ref_ll) < 1e-3


def test_loglikelihood_rolling_windows(adapter, model):
    """Rolling ll == sum of disjoint max_length-1 windows each scored
    with one token of left context (the harness's convention)."""
    text = "a" * 100 + "the quick brown fox jumps over it"  # > one window
    # harness Instances carry .args=(text,); bare strings also accepted
    (ll,) = adapter.loglikelihood_rolling([_Req(text)])
    (ll_str,) = adapter.loglikelihood_rolling([text])
    assert abs(ll - ll_str) < 1e-9
    toks = list(text.encode("latin1"))
    step = adapter.max_length - 1
    pairs = []
    for i in range(0, len(toks), step):
        ctx = [ByteTokenizer.bos_token_id] if i == 0 else [toks[i - 1]]
        pairs.append((ctx, toks[i:i + step]))
    ref = sum(l for l, _ in lme.loglikelihood_from_ids(
        model, pairs, batch_size=4, max_len=64))
    assert abs(ll - ref) < 1e-2, (ll, ref)


def test_generate_until_stop_sequences(adapter, model):
    """generate_until decodes greedily and honors the task's stop
    strings."""
    from neural_compressor_tpu.generation import greedy_search

    ctx = "abcd"
    tok = ByteTokenizer()
    ids = tok(ctx, return_tensors="np")["input_ids"]
    ref = greedy_search(model, jnp.asarray(ids), max_new_tokens=8,
                        eos_token_id=0)
    full = tok.decode(np.asarray(ref)[0, ids.shape[1]:])
    stop = full[2]  # some character greedy emits mid-stream
    (out,) = adapter.generate_until(
        [(ctx, {"until": [stop], "max_gen_toks": 8})])
    assert out == full.split(stop)[0]
    # string-form "until" and no stop both work
    (out2,) = adapter.generate_until(
        [(ctx, {"until": stop, "max_gen_toks": 8})])
    assert out2 == out
    (out3,) = adapter.generate_until([(ctx, {"max_gen_toks": 8})])
    assert out3 == full


def test_subclasses_real_harness_lm_when_installed(model):
    """With a (mocked) ``lm_eval`` package importable, the adapter class
    derives from the harness's LM base — what simple_evaluate's
    isinstance check requires — and instances still evaluate."""
    class _FakeLM:
        def __init__(self):
            self._rank = 0

    fake_pkg = types.ModuleType("lm_eval")
    fake_api = types.ModuleType("lm_eval.api")
    fake_model = types.ModuleType("lm_eval.api.model")
    fake_model.LM = _FakeLM
    fake_pkg.api = fake_api
    fake_api.model = fake_model
    saved = {k: sys.modules.get(k) for k in
             ("lm_eval", "lm_eval.api", "lm_eval.api.model")}
    sys.modules.update({"lm_eval": fake_pkg, "lm_eval.api": fake_api,
                        "lm_eval.api.model": fake_model})
    try:
        mod = importlib.reload(lme)
        assert issubclass(mod.LMEvalAdapter, _FakeLM)
        lm = mod.LMEvalAdapter(model, ByteTokenizer(), batch_size=4,
                               max_length=64)
        assert lm._rank == 0  # FakeLM.__init__ ran (super().__init__())
        (ll, greedy), = lm.loglikelihood([("ab", "cd")])
        assert np.isfinite(ll)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        importlib.reload(lme)
