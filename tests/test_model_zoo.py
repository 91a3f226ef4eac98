"""New model families (GPT-J / BLOOM / Falcon / OPT): numerical parity vs
HF transformers (torch CPU) on tiny random checkpoints, plus cache-decode
consistency and quantize+generate flows.

The HF model is instantiated with random init, saved with save_pretrained,
imported through models.hf_import, and both are run on the same ids — this
validates the tensor-name mapping, transposes, rotary/alibi math, and MQA
head splits end-to-end (reference coverage: modeling_auto.py:92,
llm_recipes.md families)."""

import numpy as np
import pytest

# 13-family HF-parity sweep — the slow zoo gate
pytestmark = pytest.mark.slow
import jax.numpy as jnp
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import named_modules
from neural_compressor_tpu.models import (
    BloomForCausalLM, FalconForCausalLM, GPTJForCausalLM,
    GPTNeoXForCausalLM, PhiForCausalLM)
from neural_compressor_tpu.models.hf_import import (
    detect_architecture, load_hf_model)
from neural_compressor_tpu.models.llama import init_kv_cache


def _hf_tiny(family, tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    if family == "gptj":
        cfg = transformers.GPTJConfig(
            vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
            rotary_dim=8)
        m = transformers.GPTJForCausalLM(cfg)
    elif family == "bloom":
        cfg = transformers.BloomConfig(
            vocab_size=128, hidden_size=64, n_layer=2, n_head=4)
        m = transformers.BloomForCausalLM(cfg)
    elif family == "falcon":
        cfg = transformers.FalconConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, multi_query=True, parallel_attn=True,
            bias=False, new_decoder_architecture=False, alibi=False)
        m = transformers.FalconForCausalLM(cfg)
    elif family == "opt":
        cfg = transformers.OPTConfig(
            vocab_size=128, hidden_size=64, ffn_dim=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=64, do_layer_norm_before=True)
        m = transformers.OPTForCausalLM(cfg)
    elif family == "gptneox":
        cfg = transformers.GPTNeoXConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128, rotary_pct=0.25,
            use_parallel_residual=True)
        m = transformers.GPTNeoXForCausalLM(cfg)
    elif family == "gptneox-seq":
        cfg = transformers.GPTNeoXConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128, rotary_pct=0.5,
            use_parallel_residual=False)
        m = transformers.GPTNeoXForCausalLM(cfg)
    elif family == "phi":
        cfg = transformers.PhiConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            partial_rotary_factor=0.5)
        m = transformers.PhiForCausalLM(cfg)
    else:  # pragma: no cover
        raise ValueError(family)
    m = m.eval().float()
    d = tmp_path / family
    m.save_pretrained(d, safe_serialization=True)
    return m, str(d)


def test_qwen2_hf_parity(tmp_path):
    """Qwen2 (llama-family + QKV biases) loads through the llama loader
    with exact numerics."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    hf_model = transformers.Qwen2ForCausalLM(cfg).eval().float()
    d = tmp_path / "qwen2"
    hf_model.save_pretrained(d, safe_serialization=True)
    assert detect_architecture(str(d)) == "llama"
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert model.model.layers[0].self_attn.q_proj.bias is not None
    ids = np.random.default_rng(0).integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, err
    # quantize + generate still works with biased projections
    import neural_compressor_tpu as nq
    from neural_compressor_tpu.generation import greedy_search

    qm = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=32))
    out = greedy_search(qm, jnp.asarray(ids[:1]), max_new_tokens=4)
    assert out.shape == (1, 14)


def test_baichuan_w_pack_import(tmp_path):
    """Baichuan-7B = llama graph + fused W_pack: fusing a tiny llama
    checkpoint's q/k/v into W_pack and relabeling the architecture must
    reproduce the plain llama import bit-for-bit."""
    import json as _json

    import torch
    import transformers
    from safetensors.torch import load_file, save_file

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False)
    hf_model = transformers.LlamaForCausalLM(cfg).eval().float()
    d_llama = tmp_path / "llama"
    hf_model.save_pretrained(d_llama, safe_serialization=True)

    tensors = load_file(d_llama / "model.safetensors")
    fused = {}
    for name, t in tensors.items():
        if ".self_attn.q_proj.weight" in name:
            stem = name.rsplit("q_proj.weight", 1)[0]
            fused[stem + "W_pack.weight"] = torch.cat(
                [tensors[stem + f"{p}_proj.weight"] for p in "qkv"], dim=0)
        elif ".self_attn.k_proj.weight" in name or \
                ".self_attn.v_proj.weight" in name:
            continue
        else:
            fused[name] = t
    d_bc = tmp_path / "baichuan"
    d_bc.mkdir()
    save_file(fused, d_bc / "model.safetensors")
    hf_cfg = _json.loads((d_llama / "config.json").read_text())
    hf_cfg["architectures"] = ["BaichuanForCausalLM"]
    hf_cfg["model_type"] = "baichuan"
    (d_bc / "config.json").write_text(_json.dumps(hf_cfg))

    assert detect_architecture(str(d_bc)) == "baichuan"
    ref = load_hf_model(str(d_llama), dtype=jnp.float32)
    got = load_hf_model(str(d_bc), dtype=jnp.float32)
    ids = np.random.default_rng(3).integers(0, 128, (2, 9))
    np.testing.assert_array_equal(
        np.asarray(ref(jnp.asarray(ids))), np.asarray(got(jnp.asarray(ids))))


@pytest.mark.parametrize("family", ["gptj", "bloom", "falcon", "opt",
                                    "gptneox", "gptneox-seq", "phi"])
def test_hf_parity(family, tmp_path):
    import torch

    hf_model, d = _hf_tiny(family, tmp_path)
    assert detect_architecture(d) == family.split("-")[0]
    model = load_hf_model(d, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    # compare softmax-invariant logits (tied heads can differ by const)
    ref = ref - ref.mean(-1, keepdims=True)
    got = got - got.mean(-1, keepdims=True)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"{family}: max logit diff {err}"


@pytest.mark.parametrize("cls,preset", [
    (GPTJForCausalLM, "gptj-test"),
    (BloomForCausalLM, "bloom-test"),
    (FalconForCausalLM, "falcon-test"),
    (GPTNeoXForCausalLM, "gptneox-test"),
    (GPTNeoXForCausalLM, "gptneox-test-seq"),
    (PhiForCausalLM, "phi-test"),
])
class TestNewFamilies:
    def test_cache_matches_prefill(self, cls, preset):
        m = cls.from_preset(preset)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)))
        caches = init_kv_cache(m.cfg, 2, 16)
        _, caches = m(ids, caches=caches, cache_pos=0)
        pos = jnp.full((2, 1), 8)
        lg2, _ = m(ids[:, :1], positions=pos, caches=caches, cache_pos=8)
        full = m(jnp.concatenate([ids, ids[:, :1]], axis=1))
        np.testing.assert_allclose(
            np.asarray(full[:, -1], dtype=np.float32),
            np.asarray(lg2[:, 0], dtype=np.float32), atol=2e-2)

    def test_quantize_and_generate(self, cls, preset):
        from neural_compressor_tpu.generation import greedy_search

        m = cls.from_preset(preset)
        ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 8)))
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
        n_woq = sum(1 for _p, mod in named_modules(qm)
                    if isinstance(mod, WOQLinear))
        assert n_woq >= 4
        out = greedy_search(qm, ids, max_new_tokens=4)
        assert out.shape == (1, 12)


def test_glm_hf_parity(tmp_path):
    """GLM (chatglm lineage, HF-native form) folds onto the llama stack:
    GQA + qkv biases + partial INTERLEAVED rotary + fused gate_up split on
    import (reference recipe family THUDM/chatglm, llm_recipes.md)."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1)
    hf_model = transformers.GlmForCausalLM(cfg).eval().float()
    d = tmp_path / "glm"
    hf_model.save_pretrained(d, safe_serialization=True)
    assert detect_architecture(str(d)) == "llama"
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert model.cfg.rope_style == "interleaved_partial"
    assert model.cfg.partial_rotary_factor == 0.5
    ids = np.random.default_rng(1).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, err
    # KV-cache decode must agree with the full forward (rope pass-through
    # dims exercise the cache path too)
    caches = init_kv_cache(model.cfg, 2, 16)
    logits, caches = model(jnp.asarray(ids[:, :8]),
                           caches=caches, cache_pos=0)
    step, caches = model(jnp.asarray(ids[:, 8:9]),
                         positions=jnp.full((2, 1), 8), caches=caches,
                         cache_pos=8)
    full = model(jnp.asarray(ids[:, :9]))
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full[:, 8]), atol=2e-3)
    # quantize + generate
    import neural_compressor_tpu as nq
    from neural_compressor_tpu.generation import greedy_search

    qm = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=16))
    assert nq.fuse_for_serving(qm) == 4
    out = greedy_search(qm, jnp.asarray(ids[:1]), max_new_tokens=4)
    assert out.shape == (1, 16)


def test_chatglm_thudm_layout_import(tmp_path):
    """The original THUDM chatglm2/3 checkpoint layout (fused MQA
    query_key_value, fused dense_h_to_4h, transformer.encoder.* names)
    imports to the same numerics as the HF-native glm form (reference
    recipe models THUDM/chatglm2-6b, chatglm3-6b)."""
    import json

    import torch
    import transformers
    from safetensors.torch import save_file

    torch.manual_seed(0)
    cfg = transformers.GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1)
    hf_model = transformers.GlmForCausalLM(cfg).eval().float()
    sd = hf_model.state_dict()

    # write the SAME weights in THUDM layout
    out = {}
    out["transformer.embedding.word_embeddings.weight"] = \
        sd["model.embed_tokens.weight"]
    out["transformer.encoder.final_layernorm.weight"] = \
        sd["model.norm.weight"]
    out["transformer.output_layer.weight"] = sd["lm_head.weight"]
    for li in range(2):
        s, d = f"model.layers.{li}.", f"transformer.encoder.layers.{li}."
        for kind in ("weight", "bias"):
            out[f"{d}self_attention.query_key_value.{kind}"] = torch.cat(
                [sd[f"{s}self_attn.{p}_proj.{kind}"] for p in "qkv"], dim=0)
        out[f"{d}self_attention.dense.weight"] = \
            sd[f"{s}self_attn.o_proj.weight"]
        out[f"{d}mlp.dense_h_to_4h.weight"] = \
            sd[f"{s}mlp.gate_up_proj.weight"]
        out[f"{d}mlp.dense_4h_to_h.weight"] = \
            sd[f"{s}mlp.down_proj.weight"]
        for nm in ("input_layernorm.weight",
                   "post_attention_layernorm.weight"):
            out[d + nm] = sd[s + nm]
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
            "seq_length": 64, "layernorm_epsilon": cfg.rms_norm_eps,
            "add_qkv_bias": True, "rope_ratio": 1.0,
        }, f)

    assert detect_architecture(str(d)) == "llama"
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert model.cfg.rope_style == "interleaved_partial"
    ids = np.random.default_rng(2).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, err


def test_phi3_hf_parity(tmp_path):
    """Phi-3 (fused qkv_proj/gate_up_proj + longrope) folds onto the llama
    stack: fused tensors split on import, su-rope factors applied with the
    static long/short choice (reference recipe family microsoft/Phi-3,
    llm_recipes.md)."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=32,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0 + 0.1 * i for i in range(8)],
                      "long_factor": [1.5 + 0.2 * i for i in range(8)]},
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1)
    hf_model = transformers.Phi3ForCausalLM(cfg).eval().float()
    d = tmp_path / "phi3"
    hf_model.save_pretrained(d, safe_serialization=True)
    assert detect_architecture(str(d)) == "llama"
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert model.cfg.rope_scaling["type"] == "longrope"
    # 12 tokens: inside the original 32-token context -> short factors,
    # but the attention factor still applies (max_pos 64 > original 32)
    ids = np.random.default_rng(1).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, err
    # 40 tokens: past the original context -> HF's dynamic rope update
    # switches to the long factors; our scalar select must follow
    ids40 = np.random.default_rng(4).integers(0, 128, (2, 40))
    with torch.no_grad():
        ref40 = hf_model(torch.tensor(ids40)).logits.numpy()
    got40 = np.asarray(model(jnp.asarray(ids40)), dtype=np.float32)
    err40 = np.abs(ref40 - got40).max()
    assert err40 < 5e-3, err40
    # cache decode agrees with the full forward under longrope tables
    caches = init_kv_cache(model.cfg, 2, 16)
    _, caches = model(jnp.asarray(ids[:, :8]), caches=caches, cache_pos=0)
    step, _ = model(jnp.asarray(ids[:, 8:9]),
                    positions=jnp.full((2, 1), 8), caches=caches,
                    cache_pos=8)
    full = model(jnp.asarray(ids[:, :9]))
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full[:, 8]), atol=2e-3)
    # quantize + generate through the fused-serving path
    from neural_compressor_tpu.generation import greedy_search

    qm = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=16))
    assert nq.fuse_for_serving(qm) == 4
    out = greedy_search(qm, jnp.asarray(ids[:1]), max_new_tokens=4)
    assert out.shape == (1, 16)


def test_phi3_short_context_uses_short_factor(tmp_path):
    """A phi-3 config whose max context equals the original context picks
    the short factors and applies no attention rescale (HF
    _compute_longrope_parameters semantics)."""
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, original_max_position_embeddings=32,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0 + 0.25 * i for i in range(8)],
                      "long_factor": [9.0] * 8},
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1)
    hf_model = transformers.Phi3ForCausalLM(cfg).eval().float()
    d = tmp_path / "phi3s"
    hf_model.save_pretrained(d, safe_serialization=True)
    model = load_hf_model(str(d), dtype=jnp.float32)
    ids = np.random.default_rng(2).integers(0, 128, (1, 10))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, err


def test_phi4_mini_partial_rotary_parity(tmp_path):
    """Phi-4-mini layout: phi3 model_type with partial_rotary_factor 0.75
    — rotate-half over the first 0.75*D dims, rest pass-through, longrope
    factor lists sized to the rotated width."""
    import torch
    import transformers

    torch.manual_seed(2)
    rd_half = int(16 * 0.75) // 2  # head_dim 16 -> 6 factors
    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=32,
        partial_rotary_factor=0.75,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0 + 0.1 * i for i in range(rd_half)],
                      "long_factor": [1.5] * rd_half},
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1)
    hf_model = transformers.Phi3ForCausalLM(cfg).eval().float()
    d = tmp_path / "phi4mini"
    hf_model.save_pretrained(d, safe_serialization=True)
    model = load_hf_model(str(d), dtype=jnp.float32)
    assert model.cfg.partial_rotary_factor == 0.75
    for n_tok in (12, 40):  # short (short_factor) and long (long_factor)
        ids = np.random.default_rng(n_tok).integers(0, 128, (2, n_tok))
        import torch as _t
        with _t.no_grad():
            ref = hf_model(_t.tensor(ids)).logits.numpy()
        got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
        err = np.abs(ref - got).max()
        assert err < 5e-3, (n_tok, err)


def test_phi3_small_clear_error(tmp_path):
    """Unmapped phi-3 variants (small/vision) must fail fast with a clear
    message, not import silently wrong."""
    import json as _json

    d = tmp_path / "phi3small"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(
        {"architectures": ["Phi3SmallForCausalLM"],
         "model_type": "phi3small", "vocab_size": 128}))
    with pytest.raises(ValueError, match="phi-3-small"):
        detect_architecture(str(d))
