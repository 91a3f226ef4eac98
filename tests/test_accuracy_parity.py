"""Accuracy-parity regression: quantization Δppl on the trained in-repo LM.

The committed checkpoint (artifacts/tiny_lm, trained by
evaluation/train_tiny.py on the repo corpus) is a real language model —
quantization damage shows up as a held-out ppl delta. Asserts the
reference-table orderings (GPTQ ≤ RTN at int4; int8 ≈ lossless) and
absolute budgets. Reference: docs/source/llm_recipes.md ratio tables;
BASELINE.md north-star Δppl ≤ 0.1 at equal bit-width.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import calibration_forward
from neural_compressor_tpu.evaluation.lm_eval import perplexity
from neural_compressor_tpu.evaluation.train_tiny import (
    ARTIFACT_DIR, SEQ_LEN, frozen_corpus, load_tiny_lm)

pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(os.path.join(ARTIFACT_DIR,
                                        "model_state.safetensors")),
        reason="tiny_lm checkpoint not trained yet",
    ),
    # Δppl batteries over every algorithm — the slow accuracy gate
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def setup():
    train, val = frozen_corpus()
    val = val[:48]
    calib = [jnp.asarray(train[i * 8:(i + 1) * 8]) for i in range(2)]
    model = load_tiny_lm()
    ppl_fp = perplexity(model, val, batch_size=16)
    return val, calib, ppl_fp


def _quantized_ppl(cfg, val, calib=None):
    model = load_tiny_lm()
    run_fn = (None if calib is None
              else (lambda mm: calibration_forward(mm, calib)))
    qm = nq.quantize(model, cfg, run_fn=run_fn)
    return perplexity(qm, val, batch_size=16)


def test_model_is_trained(setup):
    _val, _calib, ppl_fp = setup
    assert ppl_fp < 20.0  # far below uniform (256): a real LM


def test_int8_near_lossless(setup):
    val, _calib, ppl_fp = setup
    ppl = _quantized_ppl(nq.RTNConfig(dtype="int8", bits=8, group_size=128),
                         val)
    assert ppl - ppl_fp < 0.05 * ppl_fp, (ppl, ppl_fp)


def test_gptq_int4_beats_rtn_int4(setup):
    val, calib, ppl_fp = setup
    ppl_rtn = _quantized_ppl(nq.RTNConfig(dtype="int4", group_size=64), val)
    ppl_gptq = _quantized_ppl(
        nq.GPTQConfig(dtype="int4", group_size=64, block_size=64), val,
        calib)
    assert np.isfinite(ppl_gptq) and np.isfinite(ppl_rtn)
    assert ppl_gptq <= ppl_rtn * 1.02, (ppl_gptq, ppl_rtn)
    # absolute budget: int4 GPTQ within 10% relative ppl of fp
    assert ppl_gptq - ppl_fp < 0.10 * ppl_fp, (ppl_gptq, ppl_fp)


def test_kv_cache_quantization_near_lossless(setup):
    """Decode-path ppl with a quantized KV cache: bf16-cache decode must
    match parallel eval, and int8/fp8 codes (per-token-per-head scales)
    must cost almost nothing on the trained model."""
    from neural_compressor_tpu.evaluation.lm_eval import decode_perplexity

    val, _calib, ppl_fp = setup
    kv_val = val[:16]
    model = load_tiny_lm()
    d_fp = decode_perplexity(model, kv_val, batch_size=16)
    d_i8 = decode_perplexity(model, kv_val, batch_size=16,
                             kv_quantized="int8")
    d_f8 = decode_perplexity(model, kv_val, batch_size=16,
                             kv_quantized="fp8_e4m3")
    p_fp = perplexity(model, kv_val, batch_size=16)
    # cache decode == parallel forward on the same split
    assert abs(d_fp - p_fp) < 5e-3 * p_fp, (d_fp, p_fp)
    # int8/fp8 KV codes are near-lossless (serving-config evidence)
    assert d_i8 - d_fp < 0.02 * d_fp, (d_i8, d_fp)
    assert d_f8 - d_fp < 0.02 * d_fp, (d_f8, d_fp)


def test_kv_int4_within_budget(setup):
    """Packed int4 KV (2 nibbles/byte, half-split along D): 4x cache
    capacity over bf16 at a measured, budgeted ppl cost (sym per-token
    scales; per-channel K quantization is the known next lever)."""
    from neural_compressor_tpu.evaluation.lm_eval import decode_perplexity

    val, _calib, _ppl_fp = setup
    kv_val = val[:16]
    model = load_tiny_lm()
    d_fp = decode_perplexity(model, kv_val, batch_size=16)
    d_i4 = decode_perplexity(model, kv_val, batch_size=16,
                             kv_quantized="int4")
    assert d_i4 - d_fp < 0.1, (d_i4, d_fp)  # BASELINE Δppl budget


def test_kv_int4_per_channel_k(setup):
    """Calibrated per-channel K scales (KVCacheQuantConfig per_channel_k):
    stays within the int4 budget. On this tiny byte-LM per-token scales
    adapt slightly better (+0.077 vs +0.079 — channel outliers are a
    large-model phenomenon); the machinery is the calibrated-scale path
    real LLMs need, measured honestly here."""
    from neural_compressor_tpu.algorithms.calib_capture import (
        calibration_forward as cf)
    from neural_compressor_tpu.evaluation.lm_eval import decode_perplexity

    val, calib, _ppl_fp = setup
    kv_val = val[:16]
    model = load_tiny_lm()
    qm = nq.quantize(model,
                     nq.KVCacheQuantConfig(dtype="int4", per_channel_k=True),
                     run_fn=lambda m: cf(m, calib))
    attn = qm.model.layers[0].self_attn
    assert attn.kv_k_scale[...].shape == (
        qm.cfg.num_key_value_heads, qm.cfg.head_dim)
    d_fp = decode_perplexity(model, kv_val, batch_size=16)
    d_pc = decode_perplexity(qm, kv_val, batch_size=16,
                             kv_quantized="int4")
    assert d_pc - d_fp < 0.1, (d_pc, d_fp)
