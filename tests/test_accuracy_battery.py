"""Accuracy battery where quantization MEETS architecture (round-3
VERDICT Weak #3): trained GQA / MoE / MLA models, Δppl per algorithm,
KV formats through decode, MoE through the stacked-EP serving path, MLA
through the latent cache, and an autotune run hitting the
tolerable-loss stop on a real model.

Models: artifacts/tiny_{gqa,moe,mla} (evaluation/train_tiny.py, shared
frozen corpus with tiny_lm). Reference value anchor: the recipe tables'
quantized/fp accuracy ratios ~= 1.0 (docs/source/llm_recipes.md:42-260).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import calibration_forward
from neural_compressor_tpu.evaluation.lm_eval import (decode_perplexity,
                                                      perplexity)
from neural_compressor_tpu.evaluation.train_tiny import (REPO_ROOT,
                                                         frozen_corpus,
                                                         load_tiny_model)

pytestmark = pytest.mark.slow


def _have(name):
    return os.path.exists(os.path.join(REPO_ROOT, "artifacts", name,
                                       "model_state.safetensors"))


def _setup(fam):
    if not _have(fam):
        pytest.skip(f"{fam} checkpoint not trained yet")
    train, val = frozen_corpus()
    calib = [jnp.asarray(train[i * 8:(i + 1) * 8]) for i in range(4)]
    return val[:64], (lambda mm: calibration_forward(mm, calib))


@pytest.mark.parametrize("fam", ["tiny_gqa", "tiny_moe", "tiny_mla"])
def test_quant_deltas_and_ordering(fam):
    """int8 ~ lossless; int4 within the Δppl budget; GPTQ <= RTN at
    int4 (the reference tables' ordering) — on each architecture."""
    val, run_fn = _setup(fam)
    fp = perplexity(load_tiny_model(fam), val, batch_size=16)
    p8 = perplexity(nq.quantize(load_tiny_model(fam),
                                nq.RTNConfig(dtype="int8", bits=8,
                                             group_size=128)),
                    val, batch_size=16)
    p4 = perplexity(nq.quantize(load_tiny_model(fam),
                                nq.RTNConfig(dtype="int4", group_size=128)),
                    val, batch_size=16)
    pg = perplexity(nq.quantize(load_tiny_model(fam),
                                nq.GPTQConfig(dtype="int4", group_size=128,
                                              block_size=128),
                                run_fn=run_fn),
                    val, batch_size=16)
    assert p8 - fp < 0.01, f"{fam} int8 delta {p8 - fp:.4f}"
    assert p4 - fp < 0.25, f"{fam} rtn-int4 delta {p4 - fp:.4f}"
    # north-star budget (BASELINE.md): <= 0.1 at equal bit-width for GPTQ
    assert pg - fp < 0.1, f"{fam} gptq-int4 delta {pg - fp:.4f}"
    assert pg <= p4 + 0.01, f"{fam} GPTQ ({pg:.4f}) worse than RTN ({p4:.4f})"


@pytest.mark.parametrize("fam", ["tiny_gqa", "tiny_moe"])
def test_kv_cache_formats_through_decode(fam):
    """Quantized KV through the real decode path on grouped-head (GQA)
    and routed (MoE) attention: int8 cache ~ free, fp8 small, and
    packed int4 inside the <=0.1 Δppl budget (round-5 fix: the
    symmetric per-token form cost +0.15 on GQA; the asymmetric
    per-(token, head, D-half) affine form — _kv_quant4_asym — measured
    +0.054 GQA / +0.036 MoE / +0.023 MHA)."""
    val, _ = _setup(fam)
    m = load_tiny_model(fam)
    kv_val = val[:16]
    dfp = decode_perplexity(m, kv_val, batch_size=16)
    d8 = decode_perplexity(m, kv_val, batch_size=16, kv_quantized="int8")
    dfp8 = decode_perplexity(m, kv_val, batch_size=16,
                             kv_quantized="fp8_e4m3")
    d4 = decode_perplexity(m, kv_val, batch_size=16, kv_quantized="int4")
    assert abs(d8 - dfp) < 0.02, f"{fam} int8-KV delta {d8 - dfp:.4f}"
    assert abs(dfp8 - dfp) < 0.1, f"{fam} fp8-KV delta {dfp8 - dfp:.4f}"
    assert d4 - dfp < 0.1, f"{fam} int4-KV delta {d4 - dfp:.4f}"


def test_moe_stacked_ep_path_exact():
    """The stacked (EP-shardable) MoE serving form is numerically
    identical to the dense expert loop at calibration capacity, and an
    EP mesh that fits the expert count keeps it exact."""
    from neural_compressor_tpu.models.mixtral import stack_experts_for_serving
    from neural_compressor_tpu.models.sharding import make_mesh, shard_model

    val, _ = _setup("tiny_moe")
    qm = nq.quantize(load_tiny_model("tiny_moe"),
                     nq.RTNConfig(dtype="int4", group_size=128))
    p_dense = perplexity(qm, val, batch_size=16)
    n = stack_experts_for_serving(qm, capacity_factor=2.0)
    assert n > 0
    p_stacked = perplexity(qm, val, batch_size=16)
    assert abs(p_stacked - p_dense) < 1e-3
    shard_model(qm, make_mesh((2, 4)))  # model axis 4 == n experts
    p_ep = perplexity(qm, val, batch_size=16)
    assert abs(p_ep - p_stacked) < 1e-3


def test_mla_latent_cache_decode():
    """MLA decode through the absorbed latent cache matches the
    expanded-KV decode path on a TRAINED deepseek-shaped model (the
    latent form is an algebraic refactoring, so its ppl cost must be
    noise-level), and int4 weights stay within budget through it."""
    from neural_compressor_tpu.models.deepseek import enable_mla_latent_cache

    val, _ = _setup("tiny_mla")
    kv_val = val[:16]
    m = load_tiny_model("tiny_mla")
    d_std = decode_perplexity(m, kv_val, batch_size=16)
    n = enable_mla_latent_cache(m)
    assert n > 0
    d_lat = decode_perplexity(m, kv_val, batch_size=16)
    assert abs(d_lat - d_std) < 0.02, f"latent delta {d_lat - d_std:.4f}"

    qm = nq.quantize(load_tiny_model("tiny_mla"),
                     nq.RTNConfig(dtype="int4", group_size=128))
    enable_mla_latent_cache(qm)
    d_q = decode_perplexity(qm, kv_val, batch_size=16)
    assert d_q - d_std < 0.3, f"int4+latent delta {d_q - d_std:.4f}"


def test_autotune_tolerable_loss_on_gqa():
    """End-to-end autotune on the trained GQA model: the ppl eval_fn +
    tolerable-loss stop picks a config meeting the bar (reference
    autotune acceptance: relative loss <= 1%, base_tuning.py:389-408)."""
    from neural_compressor_tpu.common.tuning import TuningConfig

    val, run_fn = _setup("tiny_gqa")
    fp = perplexity(load_tiny_model("tiny_gqa"), val[:32], batch_size=16)

    def eval_fn(model):
        # autotune maximizes: return negative ppl
        return -perplexity(model, val[:32], batch_size=16)

    cfgs = TuningConfig(
        config_set=[nq.RTNConfig(dtype="int2", group_size=128),
                    nq.RTNConfig(dtype="int4", group_size=128),
                    nq.RTNConfig(dtype="int8", bits=8, group_size=128)],
        tolerable_loss=0.01)
    best = nq.autotune(load_tiny_model("tiny_gqa"), cfgs, eval_fn=eval_fn,
                       run_fn=run_fn)
    assert best is not None
    p_best = perplexity(best, val[:32], batch_size=16)
    assert p_best <= fp * 1.01 + 1e-6, \
        f"autotune result ppl {p_best:.4f} vs fp {fp:.4f}"


@pytest.mark.parametrize("fam", ["tiny_gqa", "tiny_moe"])
def test_battery_teq_autoround_mx_quarot(fam):
    """Round-5 battery completeness (VERDICT #7): the remaining algorithm
    families hold their measured placements on trained models — AutoRound
    between GPTQ and RTN, TEQ bounded by its RTN-like regime on
    outlier-free tiny models, MXFP8 ~lossless, NVFP4 4-bit-coarse but
    bounded, QuaRot+W4A8 tracking GPTQ (full table in PERF_NOTES)."""
    val, run_fn = _setup(fam)
    fp = perplexity(load_tiny_model(fam), val, batch_size=16)

    def q(cfg, rf=None, quarot=False):
        m = load_tiny_model(fam)
        if quarot:
            from neural_compressor_tpu.algorithms.quarot import apply_quarot

            apply_quarot(m, seed=0)
        return perplexity(nq.quantize(m, cfg, run_fn=rf), val,
                          batch_size=16)

    p_rtn = q(nq.RTNConfig(dtype="int4", group_size=128))
    p_ar = q(nq.AutoRoundConfig(dtype="int4", group_size=128, iters=60),
             run_fn)
    p_teq = q(nq.TEQConfig(dtype="int4", group_size=128, train_steps=60),
              run_fn)
    p_mx8 = q(nq.MXQuantConfig(w_dtype="mxfp8_e4m3", weight_only=True))
    p_nv4 = q(nq.MXQuantConfig(w_dtype="nvfp4", blocksize=16,
                               weight_only=True))
    p_qr = q(nq.HybridGPTQConfig(dtype="int4", group_size=128,
                                 block_size=128), run_fn, quarot=True)
    assert p_ar <= p_rtn + 0.005, f"AutoRound {p_ar} vs RTN {p_rtn}"
    assert p_ar - fp < 0.1, p_ar - fp
    assert p_teq - fp < 0.12, p_teq - fp
    assert p_mx8 - fp < 0.02, p_mx8 - fp
    assert p_nv4 - fp < 0.15, p_nv4 - fp
    assert p_qr - fp < 0.1, p_qr - fp


def test_mla_quantized_latent_cache():
    """Round 5: the MLA latent cache quantizes (int8/fp8, ONE per-token
    scale serving both the score and output dots — the latent row is
    both K and V). Halves the 71x-compressed latent's HBM again;
    measured ~lossless through decode on the trained tiny_mla
    (int8 +0.002, fp8 +0.011)."""
    from neural_compressor_tpu.models.deepseek import (
        QuantLatentKVCache, enable_mla_latent_cache)

    val, _ = _setup("tiny_mla")
    kv_val = val[:16]
    m = load_tiny_model("tiny_mla")
    enable_mla_latent_cache(m)
    caches = m.init_caches(2, 8, quantized="int8")
    assert isinstance(caches[0], QuantLatentKVCache)
    dfp = decode_perplexity(m, kv_val, batch_size=16)
    d8 = decode_perplexity(m, kv_val, batch_size=16, kv_quantized="int8")
    df8 = decode_perplexity(m, kv_val, batch_size=16,
                            kv_quantized="fp8_e4m3")
    assert abs(d8 - dfp) < 0.02, f"int8 latent delta {d8 - dfp:.4f}"
    assert abs(df8 - dfp) < 0.05, f"fp8 latent delta {df8 - dfp:.4f}"


def test_mla_int4_latent_cache_documented_band():
    """Packed int4 latent (capacity option): decode Δppl sits in the
    documented ~0.18 band — OVER the 0.1 int4-KV budget because the
    latent's quantization error is correlated across the score and
    value dots (it is both K and V); asserted so the docstring's claim
    cannot drift. int8 latent is the accuracy-safe default."""
    from neural_compressor_tpu.models.deepseek import (
        Quant4LatentKVCache, enable_mla_latent_cache)

    val, _ = _setup("tiny_mla")
    kv_val = val[:16]
    m = load_tiny_model("tiny_mla")
    enable_mla_latent_cache(m)
    caches = m.init_caches(2, 8, quantized="int4")
    assert isinstance(caches[0], Quant4LatentKVCache)
    dfp = decode_perplexity(m, kv_val, batch_size=16)
    d4 = decode_perplexity(m, kv_val, batch_size=16, kv_quantized="int4")
    assert d4 - dfp < 0.3, f"int4 latent delta {d4 - dfp:.4f}"
