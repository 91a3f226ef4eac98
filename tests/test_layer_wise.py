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
