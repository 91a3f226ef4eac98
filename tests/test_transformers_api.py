"""Transformers-like API + HF import + evaluation harness tests
(reference analog: test/torch/quantization/test_transformers.py and
test/jax/ model smoke tests)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import neural_compressor_tpu as nq
from neural_compressor_tpu.evaluation import evaluate_lm, perplexity
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.transformers_api import (
    AutoModelForCausalLM,
    GPTQConfig,
    RtnConfig,
    load_low_bit,
    save_low_bit,
)


@pytest.fixture(scope="module")
def hf_llama_dir(tmp_path_factory):
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM as HFLlama

    d = tmp_path_factory.mktemp("hf_llama")
    cfg = HFCfg(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                tie_word_embeddings=False)
    HFLlama(cfg).eval().float().save_pretrained(str(d),
                                               safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def hf_gpt2_dir(tmp_path_factory):
    from transformers import GPT2Config as HFCfg, GPT2LMHeadModel as HFGPT2

    d = tmp_path_factory.mktemp("hf_gpt2")
    cfg = HFCfg(vocab_size=256, n_positions=64, n_embd=64, n_layer=2,
                n_head=4)
    HFGPT2(cfg).eval().float().save_pretrained(str(d),
                                              safe_serialization=True)
    return str(d)


class TestHFImport:
    def test_llama_exact(self, hf_llama_dir):
        from transformers import LlamaForCausalLM as HFLlama

        from neural_compressor_tpu.models.hf_import import load_hf_llama

        hm = HFLlama.from_pretrained(hf_llama_dir).eval().float()
        ids = np.random.default_rng(0).integers(0, 256, (2, 12))
        with torch.no_grad():
            y_t = hm(torch.tensor(ids)).logits.numpy()
        jm = load_hf_llama(hf_llama_dir, dtype=jnp.float32)
        y_j = np.asarray(jm(jnp.asarray(ids)), dtype=np.float32)
        np.testing.assert_allclose(y_t, y_j, atol=1e-4)

    def test_gpt2_exact(self, hf_gpt2_dir):
        from transformers import GPT2LMHeadModel as HFGPT2

        from neural_compressor_tpu.models.hf_import import load_hf_gpt2

        hm = HFGPT2.from_pretrained(hf_gpt2_dir).eval().float()
        ids = np.random.default_rng(0).integers(0, 256, (2, 12))
        with torch.no_grad():
            y_t = hm(torch.tensor(ids)).logits.numpy()
        jm = load_hf_gpt2(hf_gpt2_dir, dtype=jnp.float32)
        y_j = np.asarray(jm(jnp.asarray(ids)), dtype=np.float32)
        np.testing.assert_allclose(y_t, y_j, atol=1e-4)


class TestAutoModel:
    def test_from_pretrained_rtn(self, hf_llama_dir):
        qm = AutoModelForCausalLM.from_pretrained(
            hf_llama_dir, quantization_config=RtnConfig(bits=4, group_size=32))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"), WOQLinear)

    def test_from_pretrained_gptq_with_calib(self, hf_llama_dir):
        calib = np.random.default_rng(1).integers(0, 256, (8, 32))
        qm = AutoModelForCausalLM.from_pretrained(
            hf_llama_dir,
            quantization_config=GPTQConfig(bits=4, group_size=32,
                                           blocksize=64),
            calib_dataset=calib)
        assert isinstance(
            get_module(qm, "model.layers.1.mlp.down_proj"), WOQLinear)

    def test_save_load_low_bit(self, hf_llama_dir, tmp_path):
        qm = AutoModelForCausalLM.from_pretrained(
            hf_llama_dir, quantization_config=RtnConfig(bits=4, group_size=32))
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))
        y0 = np.asarray(qm(ids), dtype=np.float32)
        out = str(tmp_path / "low_bit")
        save_low_bit(qm, out, hf_model_dir=hf_llama_dir)
        loaded = load_low_bit(out)
        y1 = np.asarray(loaded(ids), dtype=np.float32)
        np.testing.assert_allclose(y0, y1, atol=5e-2)


class TestEvaluation:
    def test_ppl_sane_and_quant_close(self, hf_llama_dir):
        from neural_compressor_tpu.models.hf_import import load_hf_llama

        data = np.random.default_rng(2).integers(0, 256, (8, 24))
        m = load_hf_llama(hf_llama_dir, dtype=jnp.float32)
        r_fp = evaluate_lm(m, data, batch_size=4)
        assert r_fp["n_tokens"] == 8 * 23
        # random tiny model ⇒ ppl near vocab size
        assert 50 < r_fp["ppl"] < 1000
        qm = nq.quantize(m, nq.RTNConfig(dtype="int8", group_size=32))
        r_q = evaluate_lm(qm, data, batch_size=4)
        assert abs(r_q["ppl"] - r_fp["ppl"]) / r_fp["ppl"] < 0.05

    def test_pad_masking(self, hf_llama_dir):
        from neural_compressor_tpu.models.hf_import import load_hf_llama

        m = load_hf_llama(hf_llama_dir, dtype=jnp.float32)
        data = np.random.default_rng(3).integers(0, 256, (4, 16))
        data[:, 10:] = 255  # will be treated as pad below
        r = evaluate_lm(m, data, batch_size=4, pad_id=255)
        assert r["n_tokens"] < 4 * 15


class TestLoglikelihood:
    def test_loglikelihood_scoring(self, hf_llama_dir):
        from neural_compressor_tpu.evaluation import loglikelihood_from_ids
        from neural_compressor_tpu.models.hf_import import load_hf_llama

        m = load_hf_llama(hf_llama_dir, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        pairs = [(rng.integers(0, 256, (n,)).tolist(),
                  rng.integers(0, 256, (3,)).tolist()) for n in (4, 7, 5)]
        res = loglikelihood_from_ids(m, pairs, batch_size=2)
        assert len(res) == 3
        for ll, greedy in res:
            assert ll < 0 and isinstance(greedy, bool)

    def test_greedy_continuation_flag(self, hf_llama_dir):
        from neural_compressor_tpu.evaluation import loglikelihood_from_ids
        from neural_compressor_tpu.generation import greedy_search
        from neural_compressor_tpu.models.hf_import import load_hf_llama

        m = load_hf_llama(hf_llama_dir, dtype=jnp.float32)
        ctx = np.random.default_rng(1).integers(0, 256, (6,))
        out = greedy_search(m, jnp.asarray(ctx)[None, :], max_new_tokens=3)
        cont = np.asarray(out)[0, 6:].tolist()
        res = loglikelihood_from_ids(m, [(ctx.tolist(), cont)])
        assert res[0][1] is True  # the greedy continuation must be flagged


def test_from_pretrained_awq_checkpoint(tmp_path):
    """from_pretrained on a pre-quantized AutoAWQ checkpoint routes to the
    AWQ importer automatically (reference modeling_auto quant_method
    dispatch)."""
    from tests.test_opt_export import _to_awq_layout

    import json as _json
    import torch
    import transformers
    from safetensors.numpy import load_file, save_file

    from neural_compressor_tpu.layers.woq_linear import WOQLinear
    from neural_compressor_tpu.ops.qtensor import quantize_tensor
    from neural_compressor_tpu.transformers_api import AutoModelForCausalLM

    torch.manual_seed(1)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    transformers.LlamaForCausalLM(cfg).eval().float().save_pretrained(
        tmp_path / "m", safe_serialization=True)
    d = tmp_path / "m"
    raw = load_file(str(d / "model.safetensors"))
    proj = (".q_proj.weight", ".k_proj.weight", ".v_proj.weight",
            ".o_proj.weight", ".gate_proj.weight", ".up_proj.weight",
            ".down_proj.weight")
    out = {}
    for name, arr in raw.items():
        if name.endswith(proj):
            qt = quantize_tensor(jnp.asarray(arr.astype(np.float32)).T,
                                 bits=4, group_size=16, scheme="asym")
            qw, qz, sc = _to_awq_layout(np.asarray(qt.codes, np.int32),
                                        np.asarray(qt.zeros, np.int32),
                                        np.asarray(qt.scales))
            stem = name[: -len(".weight")]
            out[stem + ".qweight"] = qw
            out[stem + ".qzeros"] = qz
            out[stem + ".scales"] = sc.astype(np.float32)
        else:
            out[name] = arr
    save_file(out, str(d / "model.safetensors"))
    hf_cfg = _json.loads((d / "config.json").read_text())
    hf_cfg["quantization_config"] = {"quant_method": "awq", "bits": 4,
                                     "group_size": 16, "version": "gemm"}
    (d / "config.json").write_text(_json.dumps(hf_cfg))

    model = AutoModelForCausalLM.from_pretrained(str(d), dtype=jnp.float32)
    assert isinstance(model.model.layers[0].self_attn.q_proj, WOQLinear)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 8)))
    assert model(ids).shape == (1, 8, 128)


def test_from_pretrained_hf_gptq_checkpoint(tmp_path):
    """from_pretrained on a GPTQ-quantized HF checkpoint (AutoGPTQ layout
    under quantization_config.quant_method='gptq'): bit-exact with the
    in-memory quantized model the tensors came from."""
    import json as _json
    import torch
    import transformers
    from safetensors.numpy import load_file, save_file

    import neural_compressor_tpu as nq
    from neural_compressor_tpu.layers.module_utils import named_modules
    from neural_compressor_tpu.layers.woq_linear import WOQLinear
    from neural_compressor_tpu.models.hf_import import load_hf_model
    from neural_compressor_tpu.ops.packing import to_gptq_layout
    from neural_compressor_tpu.transformers_api import AutoModelForCausalLM

    torch.manual_seed(3)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    transformers.LlamaForCausalLM(cfg).eval().float().save_pretrained(
        tmp_path / "m", safe_serialization=True)
    d = tmp_path / "m"

    ref = nq.quantize(load_hf_model(str(d), dtype=jnp.float32),
                      nq.RTNConfig(dtype="int4", group_size=16,
                                   use_sym=False))
    raw = load_file(str(d / "model.safetensors"))
    out = {n: a for n, a in raw.items()
           if not n.endswith((".q_proj.weight", ".k_proj.weight",
                              ".v_proj.weight", ".o_proj.weight",
                              ".gate_proj.weight", ".up_proj.weight",
                              ".down_proj.weight"))}
    for path, mod in named_modules(ref):
        if isinstance(mod, WOQLinear):
            for leaf, arr in to_gptq_layout(mod.packed_weight()).items():
                out[f"{path}.{leaf}"] = np.asarray(arr)
    save_file(out, str(d / "model.safetensors"))
    hf_cfg = _json.loads((d / "config.json").read_text())
    hf_cfg["quantization_config"] = {"quant_method": "gptq", "bits": 4,
                                     "group_size": 16, "sym": False}
    (d / "config.json").write_text(_json.dumps(hf_cfg))

    model = AutoModelForCausalLM.from_pretrained(str(d), dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (2, 9)))
    # the optimum layout stores fp16 scales — the only difference vs the
    # f32 in-memory model is that rounding
    np.testing.assert_allclose(
        np.asarray(model(ids), dtype=np.float32),
        np.asarray(ref(ids), dtype=np.float32), atol=1e-2)
