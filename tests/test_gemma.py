"""Gemma family (gemma-1/2/3-text): HF-transformers numerical parity on
tiny random checkpoints, cache-decode consistency across sliding-window
layers, and quantize+generate.

Reference coverage: the reference's JAX frontend quantizes Gemma3
(test/jax/test_gemma3.py) and its transformers API routes google/gemma
checkpoints; the family exercises mechanics no other zoo member has —
(1+w) RMSNorm, post-norm sandwiches, decoupled attention scale, logit
softcapping, QK-norm, and per-layer sliding/global attention with two
rope thetas."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import named_modules
from neural_compressor_tpu.models import GemmaForCausalLM
from neural_compressor_tpu.models.hf_import import (
    detect_architecture, load_hf_model)
from neural_compressor_tpu.models.llama import init_kv_cache


@pytest.mark.slow
def test_gemma2_hf_parity(tmp_path):
    """Sliding/global alternation, softcaps, post-norms, decoupled scale."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=24.0, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=64)
    hf_model = transformers.Gemma2ForCausalLM(cfg).eval().float()
    d = tmp_path / "gemma2"
    hf_model.save_pretrained(d, safe_serialization=True)
    assert detect_architecture(str(d)) == "gemma"
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert model.cfg.layer_types[:2] == ("sliding_attention",
                                         "full_attention")
    # seq > sliding_window so the band mask actually masks
    ids = np.random.default_rng(0).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"gemma2: max logit diff {err}"


@pytest.mark.slow
def test_gemma1_hf_parity(tmp_path):
    """gemma-1: two-norm llama-style layers, head_dim**-0.5 scale, no
    softcaps/sliding — the use_post_norms=False degenerate form."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64)
    hf_model = transformers.GemmaForCausalLM(cfg).eval().float()
    d = tmp_path / "gemma1"
    hf_model.save_pretrained(d, safe_serialization=True)
    assert detect_architecture(str(d)) == "gemma"
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert not model.cfg.use_post_norms
    ids = np.random.default_rng(2).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"gemma1: max logit diff {err}"


@pytest.mark.slow
def test_gemma3_hf_parity(tmp_path):
    """QK-norm and the dual rope tables (local theta on sliding layers)."""
    import torch
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    torch.manual_seed(0)
    cfg = Gemma3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=8, max_position_embeddings=64)
    hf_model = Gemma3ForCausalLM(cfg).eval().float()
    d = tmp_path / "gemma3"
    hf_model.save_pretrained(d, safe_serialization=True)
    assert detect_architecture(str(d)) == "gemma"
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert model.cfg.use_qk_norm
    assert model.cfg.rope_local_theta == pytest.approx(10000.0)
    assert model.cfg.layer_types[-1] == "full_attention"
    ids = np.random.default_rng(1).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"gemma3: max logit diff {err}"


@pytest.mark.parametrize("preset", ["gemma-test", "gemma2-test",
                                    "gemma3-test"])
def test_cache_matches_prefill(preset):
    """Cached decode == full prefill, with the prompt LONGER than the
    sliding window so the band mask is live through the cache path."""
    m = GemmaForCausalLM.from_preset(preset)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 10)))
    caches = init_kv_cache(m.cfg, 2, 16)
    _, caches = m(ids, caches=caches, cache_pos=0)
    pos = jnp.full((2, 1), 10)
    lg2, _ = m(ids[:, :1], positions=pos, caches=caches, cache_pos=10)
    full = m(jnp.concatenate([ids, ids[:, :1]], axis=1))
    np.testing.assert_allclose(
        np.asarray(full[:, -1], dtype=np.float32),
        np.asarray(lg2[:, 0], dtype=np.float32), atol=2e-2)


def test_quantize_and_generate():
    from neural_compressor_tpu.generation import greedy_search

    m = GemmaForCausalLM.from_preset("gemma2-test")
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 8)))
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    n_woq = sum(1 for _p, mod in named_modules(qm)
                if isinstance(mod, WOQLinear))
    assert n_woq >= 4
    out = greedy_search(qm, ids, max_new_tokens=4)
    assert out.shape == (1, 12)


def test_gemma_norm_fold_is_output_invariant():
    """The (1+w)-aware absorb fold (weight_offset): dividing the norm by s
    while compensating every child kernel must leave the model's output
    bit-close in f32 — this is exactly the invariant SmoothQuant/AWQ rely
    on when they later quantize the scaled kernels."""
    from neural_compressor_tpu.algorithms.awq import (ABSORB_PATTERNS,
                                                      apply_absorb_fold)

    m = GemmaForCausalLM.from_preset("gemma2-test", dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (2, 12)))
    before = np.asarray(m(ids), np.float32)
    block = m.model.layers[0]
    rng = np.random.default_rng(4)
    for parent, children, kind in ABSORB_PATTERNS["GemmaDecoderLayer"](block):
        if kind != "norm":
            continue
        s = jnp.asarray(rng.uniform(0.5, 2.0, (m.cfg.hidden_size,)),
                        jnp.float32)
        assert apply_absorb_fold(block, parent, children, members=[],
                                 kind=kind, s=s), parent
    after = np.asarray(m(ids), np.float32)
    np.testing.assert_allclose(before, after, atol=1e-4)


def test_awq_folds_into_gemma_norms():
    """AWQ absorbs its scales into gemma's (1+w) norms — params mutated,
    no runtime pre_scale on the mapped projections (the round-3 zoo-wide
    fold contract, extended to the new family)."""
    m = GemmaForCausalLM.from_preset("gemma2-test")
    blk = m.model.layers[0]
    w_in = np.asarray(blk.input_layernorm.weight[...], np.float32).copy()
    w_pre = np.asarray(blk.pre_feedforward_layernorm.weight[...],
                       np.float32).copy()
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, (2, 16)))
    qm = nq.quantize(m, nq.AWQConfig(dtype="int4", group_size=32),
                     run_fn=lambda mm: mm(ids))
    blk = qm.model.layers[0]
    for child in (blk.self_attn.q_proj, blk.mlp.gate_proj):
        assert isinstance(child, WOQLinear)
        assert child.pre_scale is None, "scale not absorbed (pre_scale set)"
    assert not np.allclose(
        w_in, np.asarray(blk.input_layernorm.weight[...], np.float32))
    assert not np.allclose(
        w_pre,
        np.asarray(blk.pre_feedforward_layernorm.weight[...], np.float32))
    y = np.asarray(qm(ids), np.float32)
    assert np.isfinite(y).all()


@pytest.mark.slow
def test_gemma_tp_forward_matches_single_device():
    """The name-based TP rules (models/sharding.py) cover gemma's
    projections: sharding a quantized gemma over an 8-device mesh must
    reproduce the single-device logits (XLA inserts the collectives)."""
    from neural_compressor_tpu.models import make_mesh, shard_model

    m = GemmaForCausalLM.from_preset("gemma2-test", dtype=jnp.float32)
    qm = nq.quantize(m, nq.RTNConfig(dtype="int8", group_size=32))
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 256, (2, 12)))
    ref = np.asarray(qm(ids), np.float32)
    shard_model(qm, make_mesh((1, 8)))
    got = np.asarray(qm(ids), np.float32)
    np.testing.assert_allclose(ref, got, atol=1e-5)


def test_multimodal_gemma3_rejected(tmp_path):
    import json

    d = tmp_path / "mm"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {"model_type": "gemma3",
         "architectures": ["Gemma3ForConditionalGeneration"]}))
    with pytest.raises(ValueError, match="vision tower"):
        detect_architecture(str(d))


@pytest.mark.slow
def test_chunked_prefill_matches_dense_gemma():
    """Gemma long-prefill (chunked online softmax with softcap and the
    sliding-window band) == the dense-mask forward on gemma-2 (softcap +
    alternating sliding layers) and gemma-3 (qk-norm, no softcap)."""
    import jax.numpy as jnp
    import numpy as np

    from neural_compressor_tpu.models import llama as L
    from neural_compressor_tpu.models.gemma import GemmaForCausalLM

    rng = np.random.default_rng(13)
    for preset in ("gemma2-test", "gemma3-test"):
        ids = jnp.asarray(rng.integers(0, 256, (2, 40)))
        m = GemmaForCausalLM.from_preset(preset)
        ref = np.asarray(m(ids), np.float32)
        old = L._DENSE_MASK_ELEMS
        try:
            L.set_dense_mask_limit(64)
            got = np.asarray(m(ids), np.float32)
        finally:
            L.set_dense_mask_limit(old)
        np.testing.assert_allclose(got, ref, atol=8e-2, rtol=8e-2,
                                   err_msg=preset)
