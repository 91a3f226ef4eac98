"""Streaming (layer-wise) checkpoint quantization tests."""

import numpy as np
import pytest

pytest.importorskip("torch")

import jax.numpy as jnp

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.hf_import import load_hf_llama
from neural_compressor_tpu.quantization.layer_wise import (
    load_quantized_checkpoint,
    quantize_hf_checkpoint_streaming,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM as HFLlama

    d = tmp_path_factory.mktemp("hf_llama_lw")
    cfg = HFCfg(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128)
    HFLlama(cfg).eval().float().save_pretrained(str(d),
                                               safe_serialization=True)
    return str(d)


def test_streaming_matches_direct(hf_dir, tmp_path):
    out = str(tmp_path / "stream_q")
    quantize_hf_checkpoint_streaming(
        hf_dir, nq.RTNConfig(dtype="int4", group_size=32), out,
        dtype=jnp.float32)
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)
    m_direct = nq.quantize(load_hf_llama(hf_dir, dtype=jnp.float32),
                           nq.RTNConfig(dtype="int4", group_size=32))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))
    np.testing.assert_allclose(
        np.asarray(m_stream(ids), dtype=np.float32),
        np.asarray(m_direct(ids), dtype=np.float32), atol=1e-3)


@pytest.mark.slow
def test_streaming_gptq_matches_in_memory(hf_dir, tmp_path):
    """Calibrated streaming GPTQ (one layer in memory at a time) must
    reproduce the in-memory GPTQ result on the same calibration data
    (both use the block-sequential scheme)."""
    from neural_compressor_tpu.algorithms.calib_capture import (
        calibration_forward)
    from neural_compressor_tpu.quantization.layer_wise import (
        gptq_quantize_checkpoint_streaming)

    rng = np.random.default_rng(3)
    calib = rng.integers(0, 256, (4, 16))
    out = str(tmp_path / "stream_gptq")
    gptq_quantize_checkpoint_streaming(
        hf_dir, nq.GPTQConfig(dtype="int4", group_size=32, block_size=32),
        out, calib, dtype=jnp.float32)
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)

    m_direct = nq.quantize(
        load_hf_llama(hf_dir, dtype=jnp.float32),
        nq.GPTQConfig(dtype="int4", group_size=32, block_size=32),
        run_fn=lambda m: calibration_forward(m, [jnp.asarray(calib)]))
    ids = jnp.asarray(rng.integers(0, 256, (2, 12)))
    a = np.asarray(m_stream(ids), dtype=np.float32)
    b = np.asarray(m_direct(ids), dtype=np.float32)
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("family", ["opt", "gptj", "bloom", "falcon"])
def test_streaming_all_archs(family, tmp_path):
    """Calibration-free streaming must cover every zoo architecture and
    the output must load + match the direct in-memory quantization."""
    import transformers

    from neural_compressor_tpu.models.hf_import import load_hf_model

    if family == "opt":
        cfg = transformers.OPTConfig(
            vocab_size=128, hidden_size=64, ffn_dim=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=64)
        hm = transformers.OPTForCausalLM(cfg)
    elif family == "gptj":
        cfg = transformers.GPTJConfig(vocab_size=128, n_positions=64,
                                      n_embd=64, n_layer=2, n_head=4,
                                      rotary_dim=8)
        hm = transformers.GPTJForCausalLM(cfg)
    elif family == "bloom":
        cfg = transformers.BloomConfig(vocab_size=128, hidden_size=64,
                                       n_layer=2, n_head=4)
        hm = transformers.BloomForCausalLM(cfg)
    else:
        cfg = transformers.FalconConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, multi_query=True, parallel_attn=True,
            bias=False, new_decoder_architecture=False, alibi=False)
        hm = transformers.FalconForCausalLM(cfg)
    d = str(tmp_path / family)
    hm.eval().float().save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / f"{family}_q")
    quantize_hf_checkpoint_streaming(
        d, nq.RTNConfig(dtype="int4", group_size=32), out,
        dtype=jnp.float32)
    # quantized tensors exist for the family's projections
    import json
    import os
    with open(os.path.join(out, "quant_config.json")) as f:
        modules = json.load(f)["modules"]
    assert len(modules) >= 8, modules.keys()
    # END-TO-END: reload matches direct in-memory quantization of the
    # imported model (exercises module-path translation + bias carry)
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)
    qm = nq.quantize(load_hf_model(d, dtype=jnp.float32),
                     nq.RTNConfig(dtype="int4", group_size=32))
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 128, (2, 10)))
    np.testing.assert_allclose(
        np.asarray(m_stream(ids), dtype=np.float32),
        np.asarray(qm(ids), dtype=np.float32), atol=2e-3)


@pytest.mark.parametrize("family", ["opt", "mixtral", "gptneox", "glm"])
@pytest.mark.slow
def test_streaming_gptq_all_archs(family, tmp_path):
    """Calibrated streaming GPTQ generalizes beyond llama: per-family
    decoder blocks are built/loaded/calibrated one at a time and the
    reloaded result matches the in-memory GPTQ on the same data
    (reference layer-wise GPTQ covers any HF model, gptq.py:286-316)."""
    import transformers

    from neural_compressor_tpu.algorithms.calib_capture import (
        calibration_forward)
    from neural_compressor_tpu.models.hf_import import load_hf_model
    from neural_compressor_tpu.quantization.layer_wise import (
        gptq_quantize_checkpoint_streaming)

    if family == "opt":
        hm = transformers.OPTForCausalLM(transformers.OPTConfig(
            vocab_size=128, hidden_size=64, ffn_dim=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=64))
    elif family == "mixtral":
        hm = transformers.MixtralForCausalLM(transformers.MixtralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4,
            num_experts_per_tok=2, max_position_embeddings=64))
    elif family == "glm":
        # fused gate_up in the checkpoint — exercises the stream remap
        hm = transformers.GlmForCausalLM(transformers.GlmConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, partial_rotary_factor=0.5,
            attention_bias=True, max_position_embeddings=64,
            pad_token_id=0, eos_token_id=1))
    else:
        hm = transformers.GPTNeoXForCausalLM(transformers.GPTNeoXConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128, rotary_pct=0.25))
    d = str(tmp_path / family)
    hm.eval().float().save_pretrained(d, safe_serialization=True)

    rng = np.random.default_rng(7)
    calib = rng.integers(0, 128, (4, 16))
    out = str(tmp_path / f"{family}_gptq")
    gptq_quantize_checkpoint_streaming(
        d, nq.GPTQConfig(dtype="int4", group_size=32, block_size=32),
        out, calib, dtype=jnp.float32)
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)
    m_direct = nq.quantize(
        load_hf_model(d, dtype=jnp.float32),
        nq.GPTQConfig(dtype="int4", group_size=32, block_size=32),
        run_fn=lambda m: calibration_forward(m, [jnp.asarray(calib)]))
    ids = jnp.asarray(rng.integers(0, 128, (2, 12)))
    a = np.asarray(m_stream(ids), dtype=np.float32)
    b = np.asarray(m_direct(ids), dtype=np.float32)
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=1e-2)


def test_streaming_self_contained(hf_dir, tmp_path):
    import os
    import shutil

    out = str(tmp_path / "stream_q2")
    quantize_hf_checkpoint_streaming(
        hf_dir, nq.RTNConfig(dtype="nf4", group_size=32), out)
    # must load with the source checkpoint gone
    moved = str(tmp_path / "moved_src")
    shutil.move(hf_dir, moved)
    try:
        m = load_quantized_checkpoint(out)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 8)))
        assert m(ids).shape == (1, 8, 256)
    finally:
        shutil.move(moved, hf_dir)


def _tiny_phi3_dir(tmp_path):
    import transformers

    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=32,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0 + 0.1 * i for i in range(8)],
                      "long_factor": [1.5] * 8},
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1)
    d = str(tmp_path / "phi3")
    transformers.Phi3ForCausalLM(cfg).eval().float().save_pretrained(
        d, safe_serialization=True)
    return d


def test_streaming_phi3_fused_qkv(tmp_path):
    """Phi-3 checkpoints carry fused qkv_proj/gate_up_proj: the streaming
    splitter must produce per-projection quantized modules that match the
    direct in-memory path."""
    from neural_compressor_tpu.models.hf_import import load_hf_model

    d = _tiny_phi3_dir(tmp_path)
    out = str(tmp_path / "phi3_q")
    quantize_hf_checkpoint_streaming(
        d, nq.RTNConfig(dtype="int4", group_size=16), out,
        dtype=jnp.float32)
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)
    qm = nq.quantize(load_hf_model(d, dtype=jnp.float32),
                     nq.RTNConfig(dtype="int4", group_size=16))
    ids = jnp.asarray(np.random.default_rng(7).integers(0, 128, (2, 10)))
    np.testing.assert_allclose(
        np.asarray(m_stream(ids), dtype=np.float32),
        np.asarray(qm(ids), dtype=np.float32), atol=2e-3)


@pytest.mark.slow
def test_streaming_gptq_phi3(tmp_path):
    """Calibrated streaming GPTQ over a phi-3 checkpoint (fused tensors
    split per layer while streaming)."""
    from neural_compressor_tpu.algorithms.calib_capture import (
        calibration_forward)
    from neural_compressor_tpu.models.hf_import import load_hf_model
    from neural_compressor_tpu.quantization.layer_wise import (
        gptq_quantize_checkpoint_streaming)

    d = _tiny_phi3_dir(tmp_path)
    out = str(tmp_path / "phi3_gptq")
    ids = np.random.default_rng(8).integers(0, 128, (2, 16))
    gptq_quantize_checkpoint_streaming(
        d, nq.GPTQConfig(dtype="int4", group_size=16), out,
        calib_ids=ids, dtype=jnp.float32)
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)
    qm = nq.quantize(load_hf_model(d, dtype=jnp.float32),
                     nq.GPTQConfig(dtype="int4", group_size=16),
                     run_fn=calibration_forward,
                     run_args=([jnp.asarray(ids)],))
    probe = jnp.asarray(ids[:, :10])
    np.testing.assert_allclose(
        np.asarray(m_stream(probe), dtype=np.float32),
        np.asarray(qm(probe), dtype=np.float32), atol=2e-3)


def test_streaming_quant_lm_head(hf_dir, tmp_path):
    """quant_lm_head=True must quantize the head in the streaming path the
    same way the in-memory RTN path does (it used to be silently dead)."""
    from neural_compressor_tpu.layers.woq_linear import WOQLinear

    out = str(tmp_path / "head_q")
    quantize_hf_checkpoint_streaming(
        hf_dir, nq.RTNConfig(dtype="int4", group_size=32,
                             quant_lm_head=True), out, dtype=jnp.float32)
    import json
    import os
    with open(os.path.join(out, "quant_config.json")) as f:
        modules = json.load(f)["modules"]
    assert "lm_head" in modules, sorted(modules)
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)
    assert isinstance(m_stream.lm_head, WOQLinear)
    m_direct = nq.quantize(
        load_hf_llama(hf_dir, dtype=jnp.float32),
        nq.RTNConfig(dtype="int4", group_size=32, quant_lm_head=True))
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (2, 12)))
    np.testing.assert_allclose(
        np.asarray(m_stream(ids), dtype=np.float32),
        np.asarray(m_direct(ids), dtype=np.float32), atol=1e-3)


def test_streaming_sharded_output_roundtrip(hf_dir, tmp_path, monkeypatch):
    """With a tiny shard budget the writer splits both outputs into
    indexed shards and the loaders read them back transparently."""
    import json
    import os

    from neural_compressor_tpu.quantization import layer_wise

    orig = layer_wise._ShardWriter.__init__
    monkeypatch.setattr(
        layer_wise._ShardWriter, "__init__",
        lambda self, d, b, max_bytes=16384: orig(self, d, b, max_bytes))
    out = str(tmp_path / "sharded_q")
    quantize_hf_checkpoint_streaming(
        hf_dir, nq.RTNConfig(dtype="int4", group_size=32), out,
        dtype=jnp.float32)
    assert os.path.exists(
        os.path.join(out, "quant_model.safetensors.index.json"))
    assert os.path.exists(
        os.path.join(out, "model.safetensors.index.json"))
    m_stream = load_quantized_checkpoint(out, dtype=jnp.float32)
    m_direct = nq.quantize(load_hf_llama(hf_dir, dtype=jnp.float32),
                           nq.RTNConfig(dtype="int4", group_size=32))
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, (2, 12)))
    np.testing.assert_allclose(
        np.asarray(m_stream(ids), dtype=np.float32),
        np.asarray(m_direct(ids), dtype=np.float32), atol=1e-3)


def test_streaming_load_strict_arch(tmp_path):
    """An explicit streaming=True on a non-llama checkpoint must raise,
    not silently materialize the full fp skeleton."""
    import transformers

    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64)
    d = str(tmp_path / "opt")
    transformers.OPTForCausalLM(cfg).eval().float().save_pretrained(
        d, safe_serialization=True)
    out = str(tmp_path / "opt_q")
    quantize_hf_checkpoint_streaming(
        d, nq.RTNConfig(dtype="int4", group_size=32), out,
        dtype=jnp.float32)
    with pytest.raises(ValueError, match="llama family only"):
        load_quantized_checkpoint(out, dtype=jnp.float32, streaming=True)


def test_streaming_chatglm_thudm_layout(tmp_path):
    """THUDM chatglm2/3 tensor names are remapped during streaming RTN the
    same way the in-memory import does (it used to quantize nothing)."""
    import json

    import torch
    import transformers
    from safetensors.torch import save_file

    from neural_compressor_tpu.models.hf_import import load_hf_model

    torch.manual_seed(0)
    cfg = transformers.GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1)
    sd = transformers.GlmForCausalLM(cfg).eval().float().state_dict()
    out = {
        "transformer.embedding.word_embeddings.weight":
            sd["model.embed_tokens.weight"],
        "transformer.encoder.final_layernorm.weight":
            sd["model.norm.weight"],
        "transformer.output_layer.weight": sd["lm_head.weight"],
    }
    for li in range(2):
        s, d2 = f"model.layers.{li}.", f"transformer.encoder.layers.{li}."
        for kind in ("weight", "bias"):
            out[f"{d2}self_attention.query_key_value.{kind}"] = torch.cat(
                [sd[f"{s}self_attn.{p}_proj.{kind}"] for p in "qkv"], dim=0)
        out[f"{d2}self_attention.dense.weight"] = \
            sd[f"{s}self_attn.o_proj.weight"]
        out[f"{d2}mlp.dense_h_to_4h.weight"] = \
            sd[f"{s}mlp.gate_up_proj.weight"]
        out[f"{d2}mlp.dense_4h_to_h.weight"] = \
            sd[f"{s}mlp.down_proj.weight"]
        for nm in ("input_layernorm.weight",
                   "post_attention_layernorm.weight"):
            out[d2 + nm] = sd[s + nm]
    d = tmp_path / "chatglm"
    d.mkdir()
    save_file({k: v.contiguous() for k, v in out.items()},
              str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "chatglm",
            "architectures": ["ChatGLMForConditionalGeneration"],
            "padded_vocab_size": 128, "hidden_size": 64,
            "ffn_hidden_size": 128, "num_layers": 2,
            "num_attention_heads": 4, "multi_query_attention": True,
            "multi_query_group_num": 2, "kv_channels": 16,
            "seq_length": 64, "layernorm_epsilon": 1e-5,
            "add_qkv_bias": True, "rope_ratio": 1.0,
        }, f)

    outdir = str(tmp_path / "chatglm_q")
    quantize_hf_checkpoint_streaming(
        str(d), nq.RTNConfig(dtype="int4", group_size=32), outdir,
        dtype=jnp.float32)
    import os
    with open(os.path.join(outdir, "quant_config.json")) as f:
        modules = json.load(f)["modules"]
    assert len(modules) == 14, sorted(modules)  # 7 projections x 2 layers
    m_stream = load_quantized_checkpoint(outdir, dtype=jnp.float32)
    m_direct = nq.quantize(load_hf_model(str(d), dtype=jnp.float32),
                           nq.RTNConfig(dtype="int4", group_size=32))
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 128, (2, 10)))
    np.testing.assert_allclose(
        np.asarray(m_stream(ids), dtype=np.float32),
        np.asarray(m_direct(ids), dtype=np.float32), atol=2e-3)
