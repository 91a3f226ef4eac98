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
