"""FP8 vLLM-compatible (compressed-tensors float-quantized) export
round-trip (round-2 VERDICT Missing #5; reference
fp8_quant/save_load.py:208 convert_weight_to_vllm_compatible)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers.qlinear import FP8Linear
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.quantization.export_hf import (
    export_fp8_compressed_tensors,
    load_fp8_compressed_tensors,
)


def _quantized_model():
    m = LlamaForCausalLM.from_preset("llama-test")
    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
    qm = nq.quantize(m, nq.FP8Config(), run_fn=lambda mm: mm(x))
    return qm, x


def test_fp8_export_roundtrip(tmp_path):
    qm, x = _quantized_model()
    ref = np.asarray(qm(x), np.float32)
    export_fp8_compressed_tensors(qm, str(tmp_path))
    assert os.path.exists(tmp_path / "model.safetensors")
    with open(tmp_path / "quantization_config.json") as f:
        qcfg = json.load(f)
    assert qcfg["quant_method"] == "compressed-tensors"
    assert qcfg["format"] == "float-quantized"
    g = qcfg["config_groups"]["group_0"]
    assert g["weights"]["type"] == "float" and g["weights"]["num_bits"] == 8

    fresh = LlamaForCausalLM.from_preset("llama-test")
    loaded = load_fp8_compressed_tensors(str(tmp_path), fresh)
    mod = get_module(loaded, "model.layers.0.self_attn.q_proj")
    assert isinstance(mod, FP8Linear)
    y = np.asarray(loaded(x), np.float32)
    # the fp8 codes and scales round-trip exactly; fp modules come from
    # the same-seed skeleton
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-5)


def test_fp8_export_tensor_layout(tmp_path):
    """Exported tensors follow the llm-compressor/vLLM conventions:
    [out, in] fp8 weight, f32 weight_scale, scalar input_scale."""
    import torch
    from safetensors.torch import load_file

    qm, _x = _quantized_model()
    export_fp8_compressed_tensors(qm, str(tmp_path))
    d = load_file(str(tmp_path / "model.safetensors"))
    key = "model.layers.0.self_attn.q_proj"
    w = d[f"{key}.weight"]
    assert w.dtype == torch.float8_e4m3fn
    mod = get_module(qm, key)
    assert tuple(w.shape) == (mod.out_features, mod.in_features)
    assert d[f"{key}.weight_scale"].dtype == torch.float32
    # per-tensor scales are single-element (torch.Size([1]), the
    # llm-compressor checkpoint convention)
    assert d[f"{key}.input_scale"].numel() == 1


def test_fp8_export_rejects_e5m2(tmp_path):
    qm, x = _quantized_model()
    mod = get_module(qm, "model.layers.0.self_attn.q_proj")
    mod.dtype_name = "fp8_e5m2"
    with pytest.raises(ValueError, match="e4m3"):
        export_fp8_compressed_tensors(qm, str(tmp_path))


def test_fp8_export_requires_fp8_modules(tmp_path):
    m = LlamaForCausalLM.from_preset("llama-test")
    with pytest.raises(ValueError, match="no FP8Linear"):
        export_fp8_compressed_tensors(m, str(tmp_path))
