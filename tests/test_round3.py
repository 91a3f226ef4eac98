"""Round-3 features: zoo-wide FP8 SDPA/softmax, the "u4_kpack" serving
layout + fused decode path, and zoo-wide AWQ/SmoothQuant absorb folds."""

import logging

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import (get_module,
                                                       named_modules)
from neural_compressor_tpu.models import (
    BloomForCausalLM, FalconForCausalLM, GPT2LMHeadModel, GPTJForCausalLM,
    GPTNeoXForCausalLM, LlamaForCausalLM, MixtralForCausalLM, OPTForCausalLM,
    PhiForCausalLM)
from neural_compressor_tpu.models.gpt2 import GPT2Config
from neural_compressor_tpu.models.llama import init_kv_cache


def _tiny(cls, preset):
    if cls is GPT2LMHeadModel:
        return cls(GPT2Config(vocab_size=256, n_embd=128, n_layer=2,
                              n_head=4), nnx.Rngs(0))
    return cls.from_preset(preset)


ZOO = [
    (LlamaForCausalLM, "llama-test"),
    (GPT2LMHeadModel, None),
    (OPTForCausalLM, "opt-test"),
    (GPTJForCausalLM, "gptj-test"),
    (BloomForCausalLM, "bloom-test"),
    (FalconForCausalLM, "falcon-test"),
    (GPTNeoXForCausalLM, "gptneox-test"),
    (PhiForCausalLM, "phi-test"),
    (MixtralForCausalLM, "mixtral-test"),
]


# ---------------------------------------------------------------------------
# FP8 SDPA / fp8 softmax on every family (VERDICT r2 Missing #4)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cls,preset", ZOO, ids=[c.__name__ for c, _ in ZOO])
def test_fp8_sdpa_flag_consumed_every_family(cls, preset):
    """Setting fp8_sdpa/fp8_softmax on the attention modules must CHANGE
    the forward numerics (i.e. be consumed, not a silent no-op) while
    staying close to the bf16 attention."""
    m = _tiny(cls, preset)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (2, 12)))
    y0 = np.asarray(m(ids), np.float32)
    n = 0
    for _p, mod in named_modules(m):
        if type(mod).__name__.endswith("Attention"):
            mod.fp8_sdpa = True
            n += 1
    assert n >= 1
    y1 = np.asarray(m(ids), np.float32)
    rel = np.linalg.norm(y1 - y0) / max(np.linalg.norm(y0), 1e-9)
    assert 0 < rel < 0.25, rel  # consumed, and sane

    for _p, mod in named_modules(m):
        if type(mod).__name__.endswith("Attention"):
            mod.fp8_sdpa = False
            mod.fp8_softmax = True
    y2 = np.asarray(m(ids), np.float32)
    rel2 = np.linalg.norm(y2 - y0) / max(np.linalg.norm(y0), 1e-9)
    assert 0 < rel2 < 0.25, rel2


def test_fp8_entry_sets_flags_on_non_llama(calib_gpt2=None):
    m = _tiny(GPT2LMHeadModel, None)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 8)))
    qm = nq.quantize(m, nq.FP8Config(quantize_attention=True,
                                     quantize_softmax=True,
                                     dump_stats_path=None),
                     run_fn=lambda mm: mm(ids))
    flags = [(getattr(mod, "fp8_sdpa", False),
              getattr(mod, "fp8_softmax", False))
             for _p, mod in named_modules(qm)
             if type(mod).__name__.endswith("Attention")]
    assert flags and all(a and b for a, b in flags)
    y = np.asarray(qm(ids), np.float32)
    assert np.isfinite(y).all()


def test_llama_decode_honors_fp8_softmax():
    """The fused decode-attention kernel must be bypassed when fp8_softmax
    is set (its softmax is bf16) — decode logits must differ from the
    unflagged decode."""
    m = LlamaForCausalLM.from_preset("llama-test")
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, 256, (1, 8)))
    tok = jnp.asarray(rng.integers(0, 256, (1, 1)))
    pos = jnp.full((1, 1), 8)

    def decode(mm):
        caches = init_kv_cache(mm.cfg, 1, 16)
        _, caches = mm(prompt, caches=caches, cache_pos=0)
        y, _ = mm(tok, positions=pos, caches=caches, cache_pos=8)
        return np.asarray(y, np.float32)

    y0 = decode(m)
    for _p, mod in named_modules(m):
        if type(mod).__name__.endswith("Attention"):
            mod.fp8_softmax = True
    y1 = decode(m)
    assert not np.allclose(y0, y1)


# ---------------------------------------------------------------------------
# u4_kpack layout + fused decode wiring
# ---------------------------------------------------------------------------


def test_u4_kpack_roundtrip_and_dequant_parity():
    from neural_compressor_tpu.ops.packing import (
        dequantize_packed, pack_codes_u4k, pack_qtensor, to_u4_kpack,
        unpack_codes_u4k)
    from neural_compressor_tpu.ops.qtensor import quantize_tensor

    rng = np.random.default_rng(0)
    codes = rng.integers(-8, 8, (64, 32)).astype(np.int8)
    w = pack_codes_u4k(jnp.asarray(codes))
    assert w.shape == (8, 32) and w.dtype == jnp.uint32
    np.testing.assert_array_equal(np.asarray(unpack_codes_u4k(w, 64, 32)),
                                  codes)
    kern = rng.normal(size=(128, 256)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(kern), bits=4, group_size=64,
                         scheme="sym", dtype="int")
    pw = pack_qtensor(qt)
    pw2 = to_u4_kpack(pw)
    np.testing.assert_allclose(np.asarray(dequantize_packed(pw)),
                               np.asarray(dequantize_packed(pw2)))


def test_u4k_matmul_matches_dequant():
    from neural_compressor_tpu.kernels.fused_matvec import u4k_matmul
    from neural_compressor_tpu.ops.packing import (dequantize_packed,
                                                   pack_qtensor, to_u4_kpack)
    from neural_compressor_tpu.ops.qtensor import quantize_tensor

    rng = np.random.default_rng(1)
    kern = rng.normal(size=(128, 256)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(kern), bits=4, group_size=128,
                         scheme="sym", dtype="int")
    pw = to_u4_kpack(pack_qtensor(qt))
    x = jnp.asarray(rng.normal(size=(3, 128)), jnp.bfloat16)
    y = np.asarray(u4k_matmul(x, pw), np.float32)
    w = np.asarray(dequantize_packed(pw, out_dtype=jnp.float32))
    yref = np.asarray(x, np.float32) @ w
    rel = np.linalg.norm(y - yref) / np.linalg.norm(yref)
    assert rel < 2e-2, rel


def test_fused_decode_wiring_and_decode_consistency():
    """to_w4a8_serving(u4k) + enable_fused_decode flags every layer and the
    lm_head; decode through the flagged model stays consistent with its own
    prefill (CPU falls back to the modular path; on TPU the fused kernels
    take over with the same math)."""
    from neural_compressor_tpu.quantization.fuse import (
        enable_fused_decode, fuse_for_serving, to_w4a8_serving)

    qm = nq.quantize(
        LlamaForCausalLM.from_preset("llama-test"),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    assert fuse_for_serving(qm) == 4
    to_w4a8_serving(qm, s4="u4k")
    assert enable_fused_decode(qm) == 2
    assert getattr(qm.model, "norm_in_head", False)

    ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, (1, 8)))
    full = qm(jnp.concatenate([ids, ids[:, :1]], axis=1))
    caches = init_kv_cache(qm.cfg, 1, 16)
    _, caches = qm(ids, caches=caches, cache_pos=0)
    lg, _ = qm(ids[:, :1], positions=jnp.full((1, 1), 8), caches=caches,
               cache_pos=8)
    np.testing.assert_allclose(np.asarray(full[:, -1], np.float32),
                               np.asarray(lg[:, 0], np.float32), atol=2e-2)


def test_fused_decode_ineligible_modules_not_flagged():
    from neural_compressor_tpu.quantization.fuse import (
        enable_fused_decode, fuse_for_serving, to_w4a8_serving)

    qm = nq.quantize(LlamaForCausalLM.from_preset("llama-test"),
                     nq.RTNConfig(dtype="int4", group_size=128))
    fuse_for_serving(qm)
    to_w4a8_serving(qm, s4=False)  # stays tpu_strided -> ineligible
    assert enable_fused_decode(qm) == 0
    assert not getattr(qm.model, "norm_in_head", False)


# ---------------------------------------------------------------------------
# zoo-wide absorb folds (VERDICT r2 Weak #3)
# ---------------------------------------------------------------------------

AWQ_FOLD_CASES = [
    (LlamaForCausalLM, "llama-test",
     "input_layernorm", "self_attn.q_proj"),
    (OPTForCausalLM, "opt-test", "self_attn_layer_norm", "self_attn.q_proj"),
    (GPTJForCausalLM, "gptj-test", "ln_1", "attn.q_proj"),
    (BloomForCausalLM, "bloom-test",
     "input_layernorm", "self_attention.query_key_value"),
    (FalconForCausalLM, "falcon-test",
     "input_layernorm", "self_attention.query_key_value"),
    (GPTNeoXForCausalLM, "gptneox-test",
     "input_layernorm", "attention.query_key_value"),
    (PhiForCausalLM, "phi-test", "input_layernorm", "self_attn.q_proj"),
    (MixtralForCausalLM, "mixtral-test",
     "input_layernorm", "self_attn.q_proj"),
]


def _first_block(model):
    for attr in ("model", "transformer", "gpt_neox"):
        inner = getattr(model, attr, None)
        if inner is not None:
            break
    else:
        inner = model
    for attr in ("layers", "h"):
        layers = getattr(inner, attr, None)
        if layers is not None:
            return layers[0]
    raise AssertionError("no block list")


@pytest.mark.parametrize(
    "cls,preset,norm_path,child_path",
    AWQ_FOLD_CASES, ids=[c.__name__ for c, *_ in AWQ_FOLD_CASES])
def test_awq_absorbs_into_norm_every_family(cls, preset, norm_path,
                                            child_path):
    """AWQ must FOLD its scales into the parent norm (scale param mutated,
    no runtime pre_scale on the quantized child) on every zoo family —
    round 2 covered llama+gpt2 only and silently fell back elsewhere."""
    m = _tiny(cls, preset)
    block = _first_block(m)
    norm = get_module(block, norm_path)
    attr = "weight" if getattr(norm, "weight", None) is not None else "scale"
    before = np.asarray(getattr(norm, attr)[...], np.float32).copy()

    ids = jnp.asarray(np.random.default_rng(7).integers(0, 256, (2, 16)))
    qm = nq.quantize(m, nq.AWQConfig(dtype="int4", group_size=32),
                     run_fn=lambda mm: mm(ids))
    block = _first_block(qm)
    child = get_module(block, child_path)
    assert isinstance(child, WOQLinear)
    assert child.pre_scale is None, "scale was not absorbed (pre_scale set)"
    norm = get_module(block, norm_path)
    after = np.asarray(getattr(norm, attr)[...], np.float32)
    assert not np.allclose(before, after), "norm param unchanged -> no fold"
    y = np.asarray(qm(ids), np.float32)
    assert np.isfinite(y).all()


class _Records(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


def test_smooth_quant_folds_and_warns_loudly():
    """SmoothQuant on a mapped family folds silently; on an unmapped block
    type it must WARN that ops were quantized without smoothing."""
    from neural_compressor_tpu.algorithms import awq as awq_mod
    from neural_compressor_tpu.common.logger import logger as pkg_logger

    ids = jnp.asarray(np.random.default_rng(8).integers(0, 256, (2, 16)))
    m = _tiny(OPTForCausalLM, "opt-test")
    block = _first_block(m)
    before = np.asarray(block.self_attn_layer_norm.scale[...],
                        np.float32).copy()
    rec = _Records()
    pkg_logger.addHandler(rec)
    try:
        qm = nq.quantize(m, nq.SmoothQuantConfig(alpha=0.5),
                         run_fn=lambda mm: mm(ids))
        after = np.asarray(
            _first_block(qm).self_attn_layer_norm.scale[...], np.float32)
        assert not np.allclose(before, after), "opt norm not smoothed"
        assert not any("without smoothing" in msg for msg in rec.messages)

        # unmapped block type: remove the pattern, expect the loud warning
        saved = awq_mod.ABSORB_PATTERNS.pop("OPTDecoderLayer")
        try:
            m2 = _tiny(OPTForCausalLM, "opt-test")
            nq.quantize(m2, nq.SmoothQuantConfig(alpha=0.5),
                        run_fn=lambda mm: mm(ids))
            assert any("without smoothing" in msg for msg in rec.messages)
        finally:
            awq_mod.ABSORB_PATTERNS["OPTDecoderLayer"] = saved
    finally:
        pkg_logger.removeHandler(rec)


@pytest.mark.slow
def test_smooth_quant_beats_plain_static_with_outliers():
    """With injected activation outliers, folded smoothing must beat plain
    static W8A8 on output error vs the fp model, on >=3 families (the
    reference's core SmoothQuant claim)."""
    ids = jnp.asarray(np.random.default_rng(9).integers(0, 250, (2, 16)))
    wins = 0
    cases = [(LlamaForCausalLM, "llama-test"), (OPTForCausalLM, "opt-test"),
             (GPTJForCausalLM, "gptj-test"), (PhiForCausalLM, "phi-test")]
    for cls, preset in cases:
        m = _tiny(cls, preset)
        # inject channel outliers into the embeddings so hidden activations
        # have the outlier structure SmoothQuant exists for
        for _p, mod in named_modules(m):
            if type(mod).__name__ == "Embed":
                e = mod.embedding[...]
                amp = np.ones(e.shape[1], np.float32)
                amp[:4] = 30.0
                mod.embedding[...] = (e.astype(jnp.float32)
                                      * jnp.asarray(amp)).astype(e.dtype)
                break
        y_fp = np.asarray(m(ids), np.float32)

        def errs(alpha):
            mm = _tiny(cls, preset)
            for _p, mod in named_modules(mm):
                if type(mod).__name__ == "Embed":
                    e = mod.embedding[...]
                    amp = np.ones(e.shape[1], np.float32)
                    amp[:4] = 30.0
                    mod.embedding[...] = (e.astype(jnp.float32)
                                          * jnp.asarray(amp)).astype(e.dtype)
                    break
            qm = nq.quantize(
                mm, nq.SmoothQuantConfig(alpha=alpha, auto_alpha=False),
                run_fn=lambda z: z(ids))
            y = np.asarray(qm(ids), np.float32)
            return float(np.linalg.norm(y - y_fp))

        # alpha=0 -> s == 1/w_amax... use folding disabled instead: plain
        # static quant is SmoothQuantConfig with alpha s.t. s==1 is not
        # expressible, so compare against StaticQuantConfig
        mm = _tiny(cls, preset)
        for _p, mod in named_modules(mm):
            if type(mod).__name__ == "Embed":
                e = mod.embedding[...]
                amp = np.ones(e.shape[1], np.float32)
                amp[:4] = 30.0
                mod.embedding[...] = (e.astype(jnp.float32)
                                      * jnp.asarray(amp)).astype(e.dtype)
                break
        q_static = nq.quantize(mm, nq.INT8StaticQuantConfig(),
                               run_fn=lambda z: z(ids))
        e_static = float(np.linalg.norm(
            np.asarray(q_static(ids), np.float32) - y_fp))
        e_sq = errs(0.5)
        if e_sq < e_static:
            wins += 1
    assert wins >= 3, f"SmoothQuant beat plain static on only {wins}/4"
