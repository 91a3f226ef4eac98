"""OPT model family + compressed-tensors export tests."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import neural_compressor_tpu as nq
from neural_compressor_tpu.generation import greedy_search
from neural_compressor_tpu.models import OPTForCausalLM
from neural_compressor_tpu.models.llama import init_kv_cache


class TestOPT:
    def test_forward_and_cache(self):
        m = OPTForCausalLM.from_preset("opt-test")
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)))
        y = m(ids)
        assert y.shape == (2, 8, 256)
        caches = init_kv_cache(m.cfg, 2, 32)
        _, caches = m(ids, caches=caches, cache_pos=0)
        lg2, _ = m(ids[:, :1], positions=jnp.full((2, 1), 8), caches=caches,
                   cache_pos=8)
        full = m(jnp.concatenate([ids, ids[:, :1]], axis=1))
        np.testing.assert_allclose(
            np.asarray(full[:, -1], dtype=np.float32),
            np.asarray(lg2[:, 0], dtype=np.float32), atol=1e-2)

    def test_quantize_and_generate(self):
        m = OPTForCausalLM.from_preset("opt-test")
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 6)))
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
        out = greedy_search(qm, ids, max_new_tokens=4)
        assert out.shape == (2, 10)


class TestCompressedTensorsExport:
    def test_export_roundtrip_values(self, tmp_path):
        from safetensors.numpy import load_file

        from neural_compressor_tpu.quantization.export_hf import (
            export_compressed_tensors,
        )
        from neural_compressor_tpu.models import LlamaForCausalLM

        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
        out = str(tmp_path / "ct")
        export_compressed_tensors(qm, out)
        t = load_file(out + "/model.safetensors")
        key = "model.layers.0.self_attn.q_proj"
        assert f"{key}.weight_packed" in t
        assert t[f"{key}.weight_shape"].tolist() == [128, 128]
        # unpack and compare against the module's dequantized weight
        from neural_compressor_tpu.layers.module_utils import get_module
        from neural_compressor_tpu.ops.packing import unpack_to_codes

        mod = get_module(qm, key)
        codes = np.asarray(unpack_to_codes(mod.packed_weight()))  # [K, N]
        packed = t[f"{key}.weight_packed"]  # [N, K/8]
        unsigned = np.zeros((packed.shape[0], packed.shape[1] * 8),
                            dtype=np.int32)
        for s in range(8):
            unsigned[:, s::8] = (packed >> (4 * s)) & 15
        np.testing.assert_array_equal(unsigned.T - 8, codes)
        cfg = json.load(open(out + "/quantization_config.json"))
        assert cfg["quant_method"] == "compressed-tensors"
        assert cfg["config_groups"]["group_0"]["weights"]["group_size"] == 32


def _to_awq_layout(codes_centered, zeros_centered, scales):
    """Inverse of ops.packing.from_awq_layout (test fixture): centered
    codes/zeros [K, N]/[ng, N] -> AWQ gemm qweight/qzeros int32."""
    o = np.array([0, 2, 4, 6, 1, 3, 5, 7])

    def pack_cols(logical):
        rows, N = logical.shape
        fwd = (np.arange(N).reshape(-1, 8)[:, o]).reshape(-1)
        raw = logical[:, fwd].astype(np.int64) & 15
        words = np.zeros((rows, N // 8), dtype=np.int64)
        for s in range(8):
            words |= raw[:, s::8] << (4 * s)
        return words.astype(np.int32)

    return (pack_cols(codes_centered + 8), pack_cols(zeros_centered + 8),
            scales.astype(np.float16))


def test_awq_checkpoint_import(tmp_path):
    """AutoAWQ ("gemm") HF checkpoint -> WOQLinear modules: synthesize an
    AWQ checkpoint from a tiny fp llama (asym int4 via our own quant
    math packed into the AWQ interleave), import through
    load_hf_awq_checkpoint, and match the QDQ reference exactly."""
    import json as _json

    import torch
    import transformers
    from safetensors.numpy import save_file

    from neural_compressor_tpu.ops.packing import from_awq_layout
    from neural_compressor_tpu.ops.qtensor import dequantize, quantize_tensor
    from neural_compressor_tpu.quantization.save_load import (
        load_hf_awq_checkpoint)
    from neural_compressor_tpu.layers.woq_linear import WOQLinear

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    hf_model = transformers.LlamaForCausalLM(cfg).eval().float()
    d = tmp_path / "awq"
    hf_model.save_pretrained(d, safe_serialization=True)

    # rebuild the checkpoint: projections -> AWQ tensors, rest fp
    from safetensors.numpy import load_file as _lf
    import os as _os
    raw = _lf(str(d / "model.safetensors"))
    out = {}
    proj = (".q_proj.weight", ".k_proj.weight", ".v_proj.weight",
            ".o_proj.weight", ".gate_proj.weight", ".up_proj.weight",
            ".down_proj.weight")
    qdq_ref = {}
    for name, arr in raw.items():
        if name.endswith(proj):
            w = jnp.asarray(arr.astype(np.float32)).T  # [K, N]
            qt = quantize_tensor(w, bits=4, group_size=16, scheme="asym")
            qdq_ref[name] = np.asarray(dequantize(qt))
            stem = name[: -len(".weight")]
            qw, qz, sc = _to_awq_layout(
                np.asarray(qt.codes, dtype=np.int32),
                np.asarray(qt.zeros, dtype=np.int32),
                np.asarray(qt.scales))
            out[stem + ".qweight"] = qw
            out[stem + ".qzeros"] = qz
            out[stem + ".scales"] = sc.astype(np.float32)
        else:
            out[name] = arr
    save_file(out, str(d / "model.safetensors"))
    hf_cfg = _json.loads((d / "config.json").read_text())
    hf_cfg["quantization_config"] = {
        "quant_method": "awq", "bits": 4, "group_size": 16,
        "version": "gemm", "zero_point": True}
    (d / "config.json").write_text(_json.dumps(hf_cfg))

    model = load_hf_awq_checkpoint(str(d), dtype=jnp.float32)
    # imported modules dequantize EXACTLY to the QDQ reference
    q0 = model.model.layers[0].self_attn.q_proj
    assert isinstance(q0, WOQLinear) and q0.zeros is not None
    got_w = np.asarray(q0.dequantized_kernel())
    ref_w = qdq_ref["model.layers.0.self_attn.q_proj.weight"]
    # the checkpoint stores fp16 scales (real AWQ files do) — the only
    # allowed difference vs the f32 QDQ reference is that rounding
    np.testing.assert_allclose(got_w, ref_w, atol=1e-4)
    # and the model runs
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 10)))
    logits = model(ids)
    assert logits.shape == (2, 10, 128)


class TestExportGuards:
    """compressed-tensors export must refuse states its format cannot
    carry instead of writing silently-corrupt checkpoints."""

    def _quantized_llama(self):
        from neural_compressor_tpu.models import LlamaForCausalLM

        m = LlamaForCausalLM.from_preset("llama-test")
        return nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))

    def test_rejects_pre_scale(self, tmp_path):
        import jax.numpy as jnp
        import pytest

        from neural_compressor_tpu.layers.module_utils import get_module
        from neural_compressor_tpu.quantization.export_hf import (
            export_compressed_tensors,
        )
        from flax import nnx

        from neural_compressor_tpu.layers.module_utils import (
            replace_module,
        )
        from neural_compressor_tpu.layers.woq_linear import WOQLinear

        qm = self._quantized_llama()
        path = "model.layers.0.self_attn.q_proj"
        mod = get_module(qm, path)
        replace_module(qm, path, WOQLinear(
            mod.packed_weight(),
            pre_scale=jnp.full((mod.in_features,), 2.0)))
        with pytest.raises(ValueError, match="pre_scale"):
            export_compressed_tensors(qm, str(tmp_path / "ct"))

    def test_rejects_mixed_groups(self, tmp_path):
        import pytest

        from neural_compressor_tpu.quantization.export_hf import (
            export_compressed_tensors,
        )
        from neural_compressor_tpu.models import LlamaForCausalLM

        m = LlamaForCausalLM.from_preset("llama-test")
        cfg = nq.RTNConfig(dtype="int4", group_size=32)
        cfg.set_local(r".*down_proj", nq.RTNConfig(dtype="int8",
                                                   group_size=32))
        qm = nq.quantize(m, cfg)
        with pytest.raises(ValueError, match="uniform"):
            export_compressed_tensors(qm, str(tmp_path / "ct"))

    def test_rejects_empty(self, tmp_path):
        import pytest

        from neural_compressor_tpu.quantization.export_hf import (
            export_compressed_tensors,
        )
        from neural_compressor_tpu.models import LlamaForCausalLM

        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(m, nq.RTNConfig(dtype="nf4", group_size=32))
        with pytest.raises(ValueError, match="no int-quantized"):
            export_compressed_tensors(qm, str(tmp_path / "ct"))

    def test_gptq_save_rejects_pre_scale(self, tmp_path):
        import jax.numpy as jnp
        import pytest
        from flax import nnx

        from neural_compressor_tpu.layers.module_utils import get_module
        from neural_compressor_tpu.quantization.save_load import save

        from neural_compressor_tpu.layers.module_utils import (
            replace_module,
        )
        from neural_compressor_tpu.layers.woq_linear import WOQLinear

        qm = self._quantized_llama()
        path = "model.layers.0.self_attn.q_proj"
        mod = get_module(qm, path)
        replace_module(qm, path, WOQLinear(
            mod.packed_weight(),
            pre_scale=jnp.full((mod.in_features,), 2.0)))
        with pytest.raises(ValueError, match="pre_scale"):
            save(qm, str(tmp_path / "g"), format="gptq")
