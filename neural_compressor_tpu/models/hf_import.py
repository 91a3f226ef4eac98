"""HuggingFace checkpoint import: torch-layout safetensors → NNX models.

Lets a user of the reference's transformers-like API
(neural_compressor/transformers/models/modeling_auto.py:92) point this
framework at the same local HF checkpoints. Torch Linear stores [out, in];
our NNX convention is [in, out] — every 2-D projection transposes on load.
Supports sharded ``model-*-of-*.safetensors`` checkpoints; weights load
shard-by-shard so peak host memory is one shard.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..common import logger
from .llama import LlamaConfig, LlamaForCausalLM
from .gpt2 import GPT2Config, GPT2LMHeadModel
from .mixtral import MixtralConfig, MixtralForCausalLM


def _iter_checkpoint_tensors(model_dir: str):
    """Yield (name, np.ndarray) from single or sharded safetensors."""
    from safetensors import safe_open

    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted(set(weight_map.values()))
        for shard in shards:
            with safe_open(os.path.join(model_dir, shard), framework="np") as f:
                for name in f.keys():
                    yield name, f.get_tensor(name)
    else:
        path = os.path.join(model_dir, "model.safetensors")
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)



# torch-side buffers that legitimately have no parameter here
_DROPPABLE_BUFFER_MARKERS = (
    "rotary_emb.inv_freq", "rotary_pos_emb", ".attn.masked_bias",
    ".attn.bias", ".attention.bias", ".attention.masked_bias",
    "embed_positions.weights",  # gptj sinusoid buffer
)


def _note_dropped(name: str) -> int:
    """Record an unmapped checkpoint tensor. Known torch buffers are
    expected; anything else means some module keeps its RANDOM INIT, so
    say it loudly instead of importing 'successfully' with garbage."""
    if any(s in name for s in _DROPPABLE_BUFFER_MARKERS):
        logger.debug("skipping checkpoint buffer %s", name)
    else:
        logger.warning(
            "import: checkpoint tensor %r was NOT mapped to any module — "
            "the target parameter keeps its random initialization", name)
    return 0


def _to_jnp(arr: np.ndarray, dtype) -> jnp.ndarray:
    if arr.dtype == np.uint16:  # bf16 stored raw
        return jnp.asarray(arr).view(jnp.bfloat16).astype(dtype)
    return jnp.asarray(arr).astype(dtype)


def llama_config_from_hf(model_dir: str, dtype=jnp.bfloat16) -> LlamaConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if hf.get("model_type") == "chatglm":
        hf = _chatglm_hf_keys(hf)
    rope_scaling = None
    rs = hf.get("rope_scaling")
    rs_type = rs.get("type", rs.get("rope_type")) if rs else None
    if rs_type in ("longrope", "su"):
        # HF phi-3 keeps original_max_position_embeddings at the top level
        rope_scaling = dict(
            type="longrope",
            short_factor=list(rs["short_factor"]),
            long_factor=list(rs["long_factor"]),
            original_max_position_embeddings=int(
                rs.get("original_max_position_embeddings")
                or hf["original_max_position_embeddings"]))
    elif rs_type == "llama3":  # Llama-3.1/3.2 frequency-band rescale
        rope_scaling = dict(
            type="llama3",
            factor=float(rs["factor"]),
            low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            original_max_position_embeddings=int(
                rs["original_max_position_embeddings"]))
    elif rs_type == "yarn":  # qwen/deepseek long-context checkpoints
        rope_scaling = dict(
            type="yarn", factor=float(rs["factor"]),
            original_max_position_embeddings=int(
                rs.get("original_max_position_embeddings")
                or hf.get("max_position_embeddings", 4096)),
            **{k: rs[k] for k in ("beta_fast", "beta_slow",
                                  "attention_factor", "mscale",
                                  "mscale_all_dim", "truncate") if k in rs})
    elif rs_type == "linear":
        rope_scaling = dict(type="linear", factor=float(rs["factor"]))
    elif rs_type == "default":
        rope_scaling = None  # explicit no-op scaling in some configs
    elif rs_type is not None:
        raise ValueError(
            f"unsupported rope_scaling type {rs_type!r} — silently loading "
            "without it would rescale attention wrongly at every position. "
            "Supported: longrope/su, llama3, linear, yarn.")
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf["num_attention_heads"]),
        head_dim=hf.get("head_dim"),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        attention_bias=(hf.get("attention_bias", False)
                        or hf.get("model_type") in ("qwen2", "glm")),
        rope_style=("interleaved_partial" if hf.get("model_type") == "glm"
                    else "half"),
        # glm defaults to 0.5; phi-3/phi-4 carry it explicitly (e.g.
        # Phi-4-mini: 0.75 with half-style rotation on the rotated slice)
        partial_rotary_factor=(hf.get("partial_rotary_factor", 0.5)
                               if hf.get("model_type") == "glm"
                               else hf.get("partial_rotary_factor", 1.0)),
        rope_scaling=rope_scaling,
        dtype=dtype,
    )


def _chatglm_hf_keys(hf: dict) -> dict:
    """Translate a THUDM chatglm2/3 config.json into HF-native glm keys
    (the two formats describe the same graph; transformers' Glm* is the
    converted form of THUDM's modeling_chatglm)."""
    heads = hf["num_attention_heads"]
    return dict(
        hf,
        model_type="glm",
        vocab_size=hf.get("padded_vocab_size", hf.get("vocab_size")),
        intermediate_size=hf["ffn_hidden_size"],
        num_hidden_layers=hf["num_layers"],
        num_key_value_heads=(hf.get("multi_query_group_num", heads)
                             if hf.get("multi_query_attention", False)
                             else heads),
        head_dim=hf.get("kv_channels"),
        max_position_embeddings=hf.get("seq_length", 32768),
        rms_norm_eps=hf.get("layernorm_epsilon", 1e-5),
        rope_theta=10000.0 * hf.get("rope_ratio", 1.0),
        attention_bias=hf.get("add_qkv_bias", True),
        partial_rotary_factor=0.5,
        tie_word_embeddings=False,
    )


def chatglm_remap_tensor(name: str, arr, cfg) -> list:
    """THUDM chatglm2/3 tensor -> llama/glm-tree tensors (with fused-qkv
    and fused-gate_up splits). Returns [] for buffers to drop
    (rotary inv_freq caches)."""
    top = {
        "transformer.embedding.word_embeddings.weight":
            "model.embed_tokens.weight",
        "transformer.encoder.final_layernorm.weight": "model.norm.weight",
        "transformer.output_layer.weight": "lm_head.weight",
    }
    if name in top:
        return [(top[name], arr)]
    pre = "transformer.encoder.layers."
    if not name.startswith(pre):
        return []
    li, sub = name[len(pre):].split(".", 1)
    base = f"model.layers.{li}."
    if sub.startswith("self_attention.query_key_value."):
        kind = sub.rsplit(".", 1)[1]  # weight | bias
        q_rows = cfg.num_attention_heads * cfg.head_dim
        kv_rows = cfg.num_key_value_heads * cfg.head_dim
        return [(f"{base}self_attn.q_proj.{kind}", arr[:q_rows]),
                (f"{base}self_attn.k_proj.{kind}",
                 arr[q_rows:q_rows + kv_rows]),
                (f"{base}self_attn.v_proj.{kind}",
                 arr[q_rows + kv_rows:q_rows + 2 * kv_rows])]
    if sub == "self_attention.dense.weight":
        return [(f"{base}self_attn.o_proj.weight", arr)]
    if sub == "mlp.dense_h_to_4h.weight":
        inter = arr.shape[0] // 2  # swiglu chunk(2): gate first, up second
        return [(f"{base}mlp.gate_proj.weight", arr[:inter]),
                (f"{base}mlp.up_proj.weight", arr[inter:])]
    if sub == "mlp.dense_4h_to_h.weight":
        return [(f"{base}mlp.down_proj.weight", arr)]
    if sub in ("input_layernorm.weight", "post_attention_layernorm.weight"):
        return [(base + sub, arr)]
    return []


def load_hf_llama(model_dir: str, dtype=jnp.bfloat16) -> LlamaForCausalLM:
    """Build a LlamaForCausalLM and fill it from a local HF checkpoint
    (llama/mistral/qwen2/glm; THUDM chatglm2/3 layout is remapped)."""
    cfg = llama_config_from_hf(model_dir, dtype=dtype)
    with open(os.path.join(model_dir, "config.json")) as f:
        chatglm = json.load(f).get("model_type") == "chatglm"
    model = LlamaForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        if chatglm:
            for name2, piece in chatglm_remap_tensor(name, arr, cfg):
                n += _assign_llama_param(model, name2, piece, dtype)
        else:
            n += _assign_llama_param(model, name, arr, dtype)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def _assign_llama_param(model, name: str, arr: np.ndarray, dtype) -> int:
    t = _to_jnp(arr, dtype)
    if name == "model.embed_tokens.weight":
        model.model.embed_tokens.embedding[...] = t
        return 1
    if name == "model.norm.weight":
        model.model.norm.weight[...] = t.astype(jnp.float32)
        return 1
    if name == "lm_head.weight":
        if model.lm_head is not None:
            model.lm_head.kernel[...] = t.T
        return 1
    if name.startswith("model.layers."):
        parts = name.split(".")
        li = int(parts[2])
        layer = model.model.layers[li]
        rest = ".".join(parts[3:])
        mapping = {
            "self_attn.q_proj.weight": layer.self_attn.q_proj,
            "self_attn.k_proj.weight": layer.self_attn.k_proj,
            "self_attn.v_proj.weight": layer.self_attn.v_proj,
            "self_attn.o_proj.weight": layer.self_attn.o_proj,
            "mlp.gate_proj.weight": layer.mlp.gate_proj,
            "mlp.up_proj.weight": layer.mlp.up_proj,
            "mlp.down_proj.weight": layer.mlp.down_proj,
        }
        if rest in mapping:
            mapping[rest].kernel[...] = t.T  # torch [out,in] -> [in,out]
            return 1
        if rest == "self_attn.qkv_proj.weight":
            # Phi-3 fused qkv [(H + 2*KV) * hd, hidden]: row order q, k, v
            # (HF Phi3Attention); split so per-projection quantization and
            # fuse_for_serving work unchanged
            cfg = model.cfg
            q_rows = cfg.num_attention_heads * cfg.head_dim
            kv_rows = cfg.num_key_value_heads * cfg.head_dim
            layer.self_attn.q_proj.kernel[...] = t[:q_rows].T
            layer.self_attn.k_proj.kernel[...] = t[q_rows:q_rows + kv_rows].T
            layer.self_attn.v_proj.kernel[...] = t[q_rows + kv_rows:].T
            return 1
        if rest == "mlp.gate_up_proj.weight":
            # GLM/Phi-3 fused gate_up [2I, H]: gate is the first half (HF
            # GlmMLP/Phi3MLP chunk(2) order); split so per-projection
            # quantization and fuse_for_serving work unchanged
            tt = t.T
            inter = tt.shape[1] // 2
            layer.mlp.gate_proj.kernel[...] = tt[:, :inter]
            layer.mlp.up_proj.kernel[...] = tt[:, inter:]
            return 1
        bias_map = {
            "self_attn.q_proj.bias": layer.self_attn.q_proj,
            "self_attn.k_proj.bias": layer.self_attn.k_proj,
            "self_attn.v_proj.bias": layer.self_attn.v_proj,
        }
        if rest in bias_map and bias_map[rest].bias is not None:
            bias_map[rest].bias[...] = t
            return 1
        if rest == "input_layernorm.weight":
            layer.input_layernorm.weight[...] = t.astype(jnp.float32)
            return 1
        if rest == "post_attention_layernorm.weight":
            layer.post_attention_layernorm.weight[...] = t.astype(jnp.float32)
            return 1
    return _note_dropped(name)


def mixtral_config_from_hf(model_dir: str, dtype=jnp.bfloat16) -> MixtralConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return MixtralConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf["num_attention_heads"]),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 1e6),
        num_local_experts=hf.get("num_local_experts", 8),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
        dtype=dtype)


def load_hf_mixtral(model_dir: str, dtype=jnp.bfloat16) -> MixtralForCausalLM:
    """Build a MixtralForCausalLM from a local HF checkpoint."""
    cfg = mixtral_config_from_hf(model_dir, dtype=dtype)
    model = MixtralForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        t = _to_jnp(arr, dtype)
        name = name.removeprefix("model.")
        if name == "embed_tokens.weight":
            model.embed_tokens.embedding[...] = t
        elif name == "norm.weight":
            model.norm.weight[...] = t.astype(jnp.float32)
        elif name == "lm_head.weight":
            model.lm_head.kernel[...] = t.T
        elif name.startswith("layers."):
            parts = name.split(".")
            li = int(parts[1])
            layer = model.layers[li]
            rest = ".".join(parts[2:])
            attn = {
                "self_attn.q_proj.weight": layer.self_attn.q_proj,
                "self_attn.k_proj.weight": layer.self_attn.k_proj,
                "self_attn.v_proj.weight": layer.self_attn.v_proj,
                "self_attn.o_proj.weight": layer.self_attn.o_proj,
                "block_sparse_moe.gate.weight": layer.block_sparse_moe.gate,
            }
            if rest in attn:
                attn[rest].kernel[...] = t.T
            elif rest == "input_layernorm.weight":
                layer.input_layernorm.weight[...] = t.astype(jnp.float32)
            elif rest == "post_attention_layernorm.weight":
                layer.post_attention_layernorm.weight[...] = t.astype(jnp.float32)
            elif rest.startswith("block_sparse_moe.experts."):
                ep = rest.split(".")
                expert = layer.block_sparse_moe.experts[int(ep[2])]
                getattr(expert, ep[3]).kernel[...] = t.T
            else:
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
        n += 1
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def gpt2_config_from_hf(model_dir: str, dtype=jnp.bfloat16) -> GPT2Config:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return GPT2Config(
        vocab_size=hf["vocab_size"], n_positions=hf["n_positions"],
        n_embd=hf["n_embd"], n_layer=hf["n_layer"], n_head=hf["n_head"],
        layer_norm_epsilon=hf.get("layer_norm_epsilon", 1e-5), dtype=dtype)


def load_hf_gpt2(model_dir: str, dtype=jnp.bfloat16) -> GPT2LMHeadModel:
    cfg = gpt2_config_from_hf(model_dir, dtype=dtype)
    model = GPT2LMHeadModel(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        name = name.removeprefix("transformer.")
        t = _to_jnp(arr, dtype)
        n += 1
        if name == "wte.weight":
            model.wte.embedding[...] = t
        elif name == "wpe.weight":
            model.wpe.embedding[...] = t
        elif name == "ln_f.weight":
            model.ln_f.scale[...] = t.astype(jnp.float32)
        elif name == "ln_f.bias":
            model.ln_f.bias[...] = t.astype(jnp.float32)
        elif name.startswith("h."):
            parts = name.split(".")
            li = int(parts[1])
            blk = model.h[li]
            rest = ".".join(parts[2:])
            # HF GPT-2 uses Conv1D: weights are already [in, out]
            if rest == "attn.c_attn.weight":
                blk.attn.c_attn.kernel[...] = t
            elif rest == "attn.c_attn.bias":
                blk.attn.c_attn.bias[...] = t
            elif rest == "attn.c_proj.weight":
                blk.attn.c_proj.kernel[...] = t
            elif rest == "attn.c_proj.bias":
                blk.attn.c_proj.bias[...] = t
            elif rest == "mlp.c_fc.weight":
                blk.mlp.c_fc.kernel[...] = t
            elif rest == "mlp.c_fc.bias":
                blk.mlp.c_fc.bias[...] = t
            elif rest == "mlp.c_proj.weight":
                blk.mlp.c_proj.kernel[...] = t
            elif rest == "mlp.c_proj.bias":
                blk.mlp.c_proj.bias[...] = t
            elif rest == "ln_1.weight":
                blk.ln_1.scale[...] = t.astype(jnp.float32)
            elif rest == "ln_1.bias":
                blk.ln_1.bias[...] = t.astype(jnp.float32)
            elif rest == "ln_2.weight":
                blk.ln_2.scale[...] = t.astype(jnp.float32)
            elif rest == "ln_2.bias":
                blk.ln_2.bias[...] = t.astype(jnp.float32)
            else:
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def opt_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    from .opt import OPTConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    proj_dim = hf.get("word_embed_proj_dim", hf["hidden_size"])
    if proj_dim != hf["hidden_size"]:
        raise ValueError(
            f"OPT word_embed_proj_dim ({proj_dim}) != hidden_size "
            f"({hf['hidden_size']}): the project_in/project_out variant "
            "(opt-350m) is not mapped and would crash/garble the load")
    return OPTConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        ffn_dim=hf["ffn_dim"], num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        dtype=dtype)


def load_hf_opt(model_dir: str, dtype=jnp.bfloat16):
    from .opt import OPTForCausalLM

    cfg = opt_config_from_hf(model_dir, dtype=dtype)
    model = OPTForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        name = name.removeprefix("model.").removeprefix("decoder.")
        t = _to_jnp(arr, dtype)
        n += 1
        if name == "embed_tokens.weight":
            model.embed_tokens.embedding[...] = t
        elif name == "embed_positions.weight":
            model.embed_positions.embedding[...] = t
        elif name in ("final_layer_norm.weight", "final_layer_norm.bias"):
            attr = "scale" if name.endswith("weight") else "bias"
            getattr(model.final_layer_norm, attr)[...] = t.astype(jnp.float32)
        elif name == "lm_head.weight":
            pass  # tied to embed_tokens
        elif name.startswith("layers."):
            parts = name.split(".")
            layer = model.layers[int(parts[1])]
            rest = ".".join(parts[2:])
            if not _assign_generic(layer, rest, t, {
                "self_attn.q_proj": layer.self_attn.q_proj,
                "self_attn.k_proj": layer.self_attn.k_proj,
                "self_attn.v_proj": layer.self_attn.v_proj,
                "self_attn.out_proj": layer.self_attn.out_proj,
                "fc1": layer.fc1,
                "fc2": layer.fc2,
            }, {
                "self_attn_layer_norm": layer.self_attn_layer_norm,
                "final_layer_norm": layer.final_layer_norm,
            }):
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def _assign_generic(layer, rest: str, t, linears: dict, norms: dict) -> bool:
    """Assign ``<mod>.weight|bias`` to Linear (transposed) / LayerNorm."""
    for prefix, lin in linears.items():
        if rest == f"{prefix}.weight":
            lin.kernel[...] = t.T
            return True
        if rest == f"{prefix}.bias" and lin.bias is not None:
            lin.bias[...] = t
            return True
    for prefix, ln in norms.items():
        if rest == f"{prefix}.weight":
            (ln.scale if hasattr(ln, "scale") else ln.weight)[...] = \
                t.astype(jnp.float32)
            return True
        if rest == f"{prefix}.bias" and getattr(ln, "bias", None) is not None:
            ln.bias[...] = t.astype(jnp.float32)
            return True
    return False


def gptj_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    from .gptj import GPTJConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return GPTJConfig(
        vocab_size=hf["vocab_size"], n_positions=hf.get("n_positions", 2048),
        n_embd=hf["n_embd"], n_layer=hf["n_layer"], n_head=hf["n_head"],
        rotary_dim=hf.get("rotary_dim") or hf["n_embd"] // hf["n_head"],
        n_inner=hf.get("n_inner"), dtype=dtype)


def load_hf_gptj(model_dir: str, dtype=jnp.bfloat16):
    from .gptj import GPTJForCausalLM

    cfg = gptj_config_from_hf(model_dir, dtype=dtype)
    model = GPTJForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        name = name.removeprefix("transformer.")
        t = _to_jnp(arr, dtype)
        n += 1
        if name == "wte.weight":
            model.wte.embedding[...] = t
        elif name in ("ln_f.weight", "ln_f.bias"):
            attr = "scale" if name.endswith("weight") else "bias"
            getattr(model.ln_f, attr)[...] = t.astype(jnp.float32)
        elif name == "lm_head.weight":
            model.lm_head.kernel[...] = t.T
        elif name == "lm_head.bias":
            model.lm_head.bias[...] = t
        elif name.startswith("h."):
            parts = name.split(".")
            blk = model.h[int(parts[1])]
            rest = ".".join(parts[2:])
            if not _assign_generic(blk, rest, t, {
                "attn.q_proj": blk.attn.q_proj,
                "attn.k_proj": blk.attn.k_proj,
                "attn.v_proj": blk.attn.v_proj,
                "attn.out_proj": blk.attn.out_proj,
                "mlp.fc_in": blk.mlp.fc_in,
                "mlp.fc_out": blk.mlp.fc_out,
            }, {"ln_1": blk.ln_1}):
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def bloom_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    from .bloom import BloomConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return BloomConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        n_layer=hf["n_layer"], n_head=hf["n_head"], dtype=dtype)


def load_hf_bloom(model_dir: str, dtype=jnp.bfloat16):
    from .bloom import BloomForCausalLM

    cfg = bloom_config_from_hf(model_dir, dtype=dtype)
    model = BloomForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        name = name.removeprefix("transformer.")
        t = _to_jnp(arr, dtype)
        n += 1
        if name == "word_embeddings.weight":
            model.word_embeddings.embedding[...] = t
        elif name.startswith("word_embeddings_layernorm."):
            attr = "scale" if name.endswith("weight") else "bias"
            getattr(model.word_embeddings_layernorm, attr)[...] = \
                t.astype(jnp.float32)
        elif name in ("ln_f.weight", "ln_f.bias"):
            attr = "scale" if name.endswith("weight") else "bias"
            getattr(model.ln_f, attr)[...] = t.astype(jnp.float32)
        elif name == "lm_head.weight":
            pass  # tied
        elif name.startswith("h."):
            parts = name.split(".")
            blk = model.h[int(parts[1])]
            rest = ".".join(parts[2:])
            # HF bloom qkv weights are [(H*3*D), E]: already the per-head
            # [H, 3, D] fused layout our attention reshapes to — transpose
            # only (our convention is [in, out])
            if not _assign_generic(blk, rest, t, {
                "self_attention.query_key_value":
                    blk.self_attention.query_key_value,
                "self_attention.dense": blk.self_attention.dense,
                "mlp.dense_h_to_4h": blk.mlp.dense_h_to_4h,
                "mlp.dense_4h_to_h": blk.mlp.dense_4h_to_h,
            }, {
                "input_layernorm": blk.input_layernorm,
                "post_attention_layernorm": blk.post_attention_layernorm,
            }):
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def falcon_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    from .falcon import FalconConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if hf.get("new_decoder_architecture", False):
        raise ValueError(
            "falcon new_decoder_architecture (40b/180b) is not mapped: its "
            "group-interleaved query_key_value layout and ln_attn/ln_mlp "
            "norms differ from the 7b graph and would load as garbage; "
            "falcon-7b-style checkpoints (multi_query) are supported")
    return FalconConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf.get("num_hidden_layers", hf.get("n_layer")),
        num_attention_heads=hf.get("num_attention_heads", hf.get("n_head")),
        num_kv_heads=(1 if hf.get("multi_query", True)
                      else hf.get("num_kv_heads", hf.get("n_head_kv", 1))),
        parallel_attn=hf.get("parallel_attn", True), dtype=dtype)


def load_hf_falcon(model_dir: str, dtype=jnp.bfloat16):
    from .falcon import FalconForCausalLM

    cfg = falcon_config_from_hf(model_dir, dtype=dtype)
    model = FalconForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    saw_lm_head = False
    for name, arr in _iter_checkpoint_tensors(model_dir):
        name = name.removeprefix("transformer.")
        t = _to_jnp(arr, dtype)
        n += 1
        if name == "word_embeddings.weight":
            model.word_embeddings.embedding[...] = t
        elif name in ("ln_f.weight", "ln_f.bias"):
            attr = "scale" if name.endswith("weight") else "bias"
            getattr(model.ln_f, attr)[...] = t.astype(jnp.float32)
        elif name == "lm_head.weight":
            model.lm_head.kernel[...] = t.T
            saw_lm_head = True
        elif name.startswith("h."):
            parts = name.split(".")
            blk = model.h[int(parts[1])]
            rest = ".".join(parts[2:])
            norms = {"input_layernorm": blk.input_layernorm}
            if not cfg.parallel_attn:
                norms["post_attention_layernorm"] = \
                    blk.post_attention_layernorm
            if not _assign_generic(blk, rest, t, {
                "self_attention.query_key_value":
                    blk.self_attention.query_key_value,
                "self_attention.dense": blk.self_attention.dense,
                "mlp.dense_h_to_4h": blk.mlp.dense_h_to_4h,
                "mlp.dense_4h_to_h": blk.mlp.dense_4h_to_h,
            }, norms):
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
    if not saw_lm_head:  # tied embeddings (falcon default)
        model.lm_head.kernel[...] = model.word_embeddings.embedding[...].T
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def gptneox_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    from .gptneox import GPTNeoXConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return GPTNeoXConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        rotary_pct=hf.get("rotary_pct", 0.25),
        rotary_emb_base=hf.get("rotary_emb_base", 10000.0),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        use_parallel_residual=hf.get("use_parallel_residual", True),
        dtype=dtype)


def load_hf_gptneox(model_dir: str, dtype=jnp.bfloat16):
    from .gptneox import GPTNeoXForCausalLM

    cfg = gptneox_config_from_hf(model_dir, dtype=dtype)
    model = GPTNeoXForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        name = name.removeprefix("gpt_neox.")
        t = _to_jnp(arr, dtype)
        n += 1
        if name == "embed_in.weight":
            model.embed_in.embedding[...] = t
        elif name in ("final_layer_norm.weight", "final_layer_norm.bias"):
            attr = "scale" if name.endswith("weight") else "bias"
            getattr(model.final_layer_norm, attr)[...] = t.astype(jnp.float32)
        elif name == "embed_out.weight":
            model.embed_out.kernel[...] = t.T
        elif name.startswith("layers."):
            parts = name.split(".")
            blk = model.layers[int(parts[1])]
            rest = ".".join(parts[2:])
            # qkv weight rows are the per-head-fused [H, 3, D] layout
            # (HF GPTNeoXAttention views heads then splits thirds) — the
            # same fused form our attention reshapes to; transpose only.
            if not _assign_generic(blk, rest, t, {
                "attention.query_key_value": blk.attention.query_key_value,
                "attention.dense": blk.attention.dense,
                "mlp.dense_h_to_4h": blk.mlp.dense_h_to_4h,
                "mlp.dense_4h_to_h": blk.mlp.dense_4h_to_h,
            }, {
                "input_layernorm": blk.input_layernorm,
                "post_attention_layernorm": blk.post_attention_layernorm,
            }):
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def phi_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    from .phi import PhiConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return PhiConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        partial_rotary_factor=hf.get("partial_rotary_factor", 0.5),
        rope_theta=hf.get("rope_theta", 10000.0),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5), dtype=dtype)


def load_hf_phi(model_dir: str, dtype=jnp.bfloat16):
    from .phi import PhiForCausalLM

    cfg = phi_config_from_hf(model_dir, dtype=dtype)
    model = PhiForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        name = name.removeprefix("model.")
        t = _to_jnp(arr, dtype)
        n += 1
        if name == "embed_tokens.weight":
            model.embed_tokens.embedding[...] = t
        elif name in ("final_layernorm.weight", "final_layernorm.bias"):
            attr = "scale" if name.endswith("weight") else "bias"
            getattr(model.final_layernorm, attr)[...] = t.astype(jnp.float32)
        elif name == "lm_head.weight":
            model.lm_head.kernel[...] = t.T
        elif name == "lm_head.bias":
            model.lm_head.bias[...] = t
        elif name.startswith("layers."):
            parts = name.split(".")
            blk = model.layers[int(parts[1])]
            rest = ".".join(parts[2:])
            if not _assign_generic(blk, rest, t, {
                "self_attn.q_proj": blk.self_attn.q_proj,
                "self_attn.k_proj": blk.self_attn.k_proj,
                "self_attn.v_proj": blk.self_attn.v_proj,
                "self_attn.dense": blk.self_attn.dense,
                "mlp.fc1": blk.mlp.fc1,
                "mlp.fc2": blk.mlp.fc2,
            }, {"input_layernorm": blk.input_layernorm}):
                n -= 1
                _note_dropped(name)
        else:
            n -= 1
            _note_dropped(name)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def load_hf_baichuan(model_dir: str, dtype=jnp.bfloat16):
    """Baichuan(-2) 7B: the llama graph with a fused ``W_pack`` QKV.

    W_pack stacks full q/k/v blocks along the out axis ([3E, E] torch) —
    split into thirds and load through the llama module tree. The 13B
    variants replace rotary with ALiBi, which the llama graph does not
    model; refuse those explicitly (reference coverage:
    docs/source/llm_recipes.md:69-93).
    """
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if hf.get("position_embedding", "ROPE").upper() == "ALIBI" or \
            hf.get("model_max_length", 0) == 4096 and hf["hidden_size"] >= 5120:
        raise ValueError(
            "Baichuan-13B uses ALiBi positions; only the rotary (7B) "
            "variants map onto the llama graph")
    cfg = LlamaConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf["num_attention_heads"],
        max_position_embeddings=hf.get("max_position_embeddings",
                                       hf.get("model_max_length", 4096)),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6), dtype=dtype)
    model = LlamaForCausalLM(cfg, nnx.Rngs(0))
    E = cfg.hidden_size
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        if name.endswith("self_attn.W_pack.weight"):
            li = int(name.split(".")[2])
            attn = model.model.layers[li].self_attn
            t = _to_jnp(arr, dtype)
            attn.q_proj.kernel[...] = t[:E].T
            attn.k_proj.kernel[...] = t[E:2 * E].T
            attn.v_proj.kernel[...] = t[2 * E:].T
            n += 3
        else:
            n += _assign_llama_param(model, name, arr, dtype)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def gemma_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    """Gemma-1/2/3(text) config.json -> GemmaConfig (HF
    configuration_gemma{,2,3}.py field names; gemma-3 multimodal wrappers
    are rejected in detect_architecture)."""
    from .gemma import GemmaConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    mt = hf.get("model_type", "gemma")
    act = hf.get("hidden_activation") or hf.get("hidden_act") \
        or "gelu_pytorch_tanh"
    if act not in ("gelu_pytorch_tanh", "gelu_tanh", "gelu"):
        raise ValueError(f"unsupported gemma activation {act!r}")
    n_layers = hf["num_hidden_layers"]
    layer_types = hf.get("layer_types")
    if layer_types is None:
        if mt == "gemma2" and hf.get("sliding_window"):
            # HF Gemma2Config default: even layers slide
            layer_types = ["sliding_attention" if i % 2 == 0
                           else "full_attention" for i in range(n_layers)]
        elif mt == "gemma3_text":
            pat = int(hf.get("sliding_window_pattern", 6))
            layer_types = ["full_attention" if (i + 1) % pat == 0
                           else "sliding_attention" for i in range(n_layers)]
    rope_scaling = None
    rs = hf.get("rope_scaling")
    rs_type = rs.get("rope_type", rs.get("type")) if rs else None
    if rs_type == "linear":  # gemma-3 4b+ global-layer scaling
        rope_scaling = dict(type="linear", factor=float(rs["factor"]))
    elif rs_type not in (None, "default"):
        raise ValueError(f"unsupported gemma rope_scaling {rs_type!r}")
    return GemmaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=n_layers,
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf["num_attention_heads"]),
        head_dim=hf.get("head_dim", 256),
        max_position_embeddings=hf.get("max_position_embeddings", 8192),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_local_theta=(hf.get("rope_local_base_freq")
                          if mt == "gemma3_text" else None),
        rope_scaling=rope_scaling,
        query_pre_attn_scalar=hf.get("query_pre_attn_scalar"),
        attn_logit_softcapping=hf.get("attn_logit_softcapping"),
        final_logit_softcapping=hf.get("final_logit_softcapping"),
        sliding_window=hf.get("sliding_window"),
        layer_types=layer_types,
        use_post_norms=mt in ("gemma2", "gemma3_text"),
        use_qk_norm=mt == "gemma3_text",
        attention_bias=hf.get("attention_bias", False),
        dtype=dtype,
    )


def load_hf_gemma(model_dir: str, dtype=jnp.bfloat16):
    from .gemma import GemmaForCausalLM

    cfg = gemma_config_from_hf(model_dir, dtype=dtype)
    model = GemmaForCausalLM(cfg, nnx.Rngs(0))
    norms = ("input_layernorm", "post_attention_layernorm",
             "pre_feedforward_layernorm", "post_feedforward_layernorm")
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        t = _to_jnp(arr, dtype)
        if name == "model.embed_tokens.weight":
            model.model.embed_tokens.embedding[...] = t
            n += 1
        elif name == "model.norm.weight":
            model.model.norm.weight[...] = t.astype(jnp.float32)
            n += 1
        elif name == "lm_head.weight":
            # tied head; some exports still materialize the duplicate
            logger.debug("gemma: ignoring tied lm_head.weight duplicate")
        elif name.startswith("model.layers."):
            parts = name.split(".")
            layer = model.model.layers[int(parts[2])]
            rest = ".".join(parts[3:])
            attn, mlp = layer.self_attn, layer.mlp
            linears = {
                "self_attn.q_proj": attn.q_proj,
                "self_attn.k_proj": attn.k_proj,
                "self_attn.v_proj": attn.v_proj,
                "self_attn.o_proj": attn.o_proj,
                "mlp.gate_proj": mlp.gate_proj,
                "mlp.up_proj": mlp.up_proj,
                "mlp.down_proj": mlp.down_proj,
            }
            stem, kind = rest.rsplit(".", 1)
            if stem in linears and kind == "weight":
                linears[stem].kernel[...] = t.T  # torch [out,in] -> [in,out]
                n += 1
            elif stem in linears and kind == "bias" and \
                    linears[stem].bias is not None:
                linears[stem].bias[...] = t
                n += 1
            elif rest == "self_attn.q_norm.weight" and \
                    attn.q_norm is not None:
                attn.q_norm.weight[...] = t.astype(jnp.float32)
                n += 1
            elif rest == "self_attn.k_norm.weight" and \
                    attn.k_norm is not None:
                attn.k_norm.weight[...] = t.astype(jnp.float32)
                n += 1
            elif any(rest == f"{nm}.weight" for nm in norms) and \
                    getattr(layer, rest.rsplit(".", 1)[0], None) is not None:
                getattr(layer, rest.rsplit(".", 1)[0]).weight[...] = \
                    t.astype(jnp.float32)
                n += 1
            else:
                n += _note_dropped(name)
        else:
            n += _note_dropped(name)
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def deepseek_config_from_hf(model_dir: str, dtype=jnp.bfloat16):
    from .deepseek import DeepseekConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    rope_scaling = None
    rs = hf.get("rope_scaling")
    if rs:
        rs_type = rs.get("rope_type", rs.get("type"))
        if rs_type != "yarn":
            raise ValueError(
                f"unsupported deepseek rope_scaling {rs_type!r} — loading "
                "without it would rescale attention wrongly (yarn is "
                "supported)")
        rope_scaling = dict(
            type="yarn", factor=float(rs["factor"]),
            original_max_position_embeddings=int(
                rs.get("original_max_position_embeddings")
                or hf.get("max_position_embeddings", 4096)),
            **{k: rs[k] for k in ("beta_fast", "beta_slow",
                                  "attention_factor", "mscale",
                                  "mscale_all_dim", "truncate") if k in rs})
    return DeepseekConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        moe_intermediate_size=hf["moe_intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        q_lora_rank=hf.get("q_lora_rank"),
        kv_lora_rank=hf["kv_lora_rank"],
        qk_rope_head_dim=hf["qk_rope_head_dim"],
        qk_nope_head_dim=hf["qk_nope_head_dim"],
        v_head_dim=hf["v_head_dim"],
        n_routed_experts=hf["n_routed_experts"],
        num_experts_per_tok=hf["num_experts_per_tok"],
        n_shared_experts=hf["n_shared_experts"],
        n_group=hf["n_group"],
        topk_group=hf["topk_group"],
        norm_topk_prob=hf.get("norm_topk_prob", True),
        routed_scaling_factor=hf.get("routed_scaling_factor", 1.0),
        first_k_dense_replace=hf.get("first_k_dense_replace", 0),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_interleave=hf.get("rope_interleave", True),
        rope_scaling=rope_scaling,
        attention_bias=hf.get("attention_bias", False),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        dtype=dtype,
    )


def load_hf_deepseek(model_dir: str, dtype=jnp.bfloat16):
    """DeepSeek-V3 checkpoint -> DeepseekForCausalLM. Leaves are resolved
    by walking the HF dotted path (the module tree mirrors HF naming);
    Linear kernels transpose [out,in] -> [in,out], norm/router params
    stay f32."""
    from .deepseek import DeepseekForCausalLM, DeepseekTopkRouter

    cfg = deepseek_config_from_hf(model_dir, dtype=dtype)
    model = DeepseekForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        t = _to_jnp(arr, dtype)
        parts = name.split(".")
        leaf = parts[-1]
        try:
            m = model
            for p in parts[:-1]:
                m = m[int(p)] if p.isdigit() else getattr(m, p)
        except (AttributeError, KeyError, IndexError):
            n += _note_dropped(name)
            continue
        if leaf == "weight" and getattr(m, "kernel", None) is not None:
            m.kernel[...] = t.T
        elif leaf == "weight" and isinstance(m, DeepseekTopkRouter):
            m.weight[...] = t.astype(jnp.float32)  # router [E, H], fp
        elif leaf == "weight" and getattr(m, "embedding", None) is not None:
            m.embedding[...] = t
        elif leaf == "weight" and getattr(m, "weight", None) is not None:
            m.weight[...] = t.astype(jnp.float32)  # RMSNorms
        elif leaf == "e_score_correction_bias":
            m.e_score_correction_bias[...] = t.astype(jnp.float32)
        elif leaf == "bias" and getattr(m, "bias", None) is not None:
            m.bias[...] = t
        else:
            n += _note_dropped(name)
            continue
        n += 1
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def detect_architecture(model_dir: str) -> str:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    archs = hf.get("architectures") or []
    mt = hf.get("model_type", "")

    def has(s):
        return any(s in a for a in archs)

    if has("Mixtral") or mt == "mixtral":
        return "mixtral"
    # guard BEFORE the substring matches below: Qwen2Moe/Qwen2VL/LlamaVision
    # contain "Qwen2"/"Llama" but have expert/vision tensors the dense
    # llama loader would silently drop (random-init MLPs, garbage logits)
    if (has("Qwen2Moe") or has("Qwen2VL") or has("VisionText")
            or mt in ("qwen2_moe", "qwen2_vl", "mllama")):
        raise ValueError(
            f"unsupported architecture {archs or mt!r}: MoE/vision "
            "variants need loaders for their expert/vision tensors and "
            "cannot be routed onto the dense llama stack")
    if (has("Llama") or has("Mistral") or has("Qwen2")
            or mt in ("llama", "mistral", "qwen2")):
        return "llama"
    if has("GlmForCausalLM") or has("ChatGLM") or mt in ("glm", "chatglm"):
        # GLM (chatglm lineage) maps onto the llama stack: GQA + qkv bias
        # + partial interleaved rotary + fused gate_up. The original THUDM
        # layout (fused MQA qkv, transformer.encoder.*) is remapped on
        # import (chatglm_remap_tensor)
        return "llama"
    if has("DeepseekV3") or mt == "deepseek_v3":
        return "deepseek"
    if has("Gemma3ForConditionalGeneration") or mt == "gemma3":
        raise ValueError(
            "multimodal gemma-3 checkpoints carry a vision tower this "
            "loader does not map; export the text tower "
            "(model_type=gemma3_text) instead")
    if has("Gemma") or mt in ("gemma", "gemma2", "gemma3_text"):
        return "gemma"
    if has("GPTJ") or mt == "gptj":
        return "gptj"
    if has("GPTNeoX") or mt == "gpt_neox":
        return "gptneox"
    if has("Phi3Small") or has("Phi3V") or mt in ("phi3small", "phi3_v"):
        raise ValueError(
            "phi-3-small (blocksparse attention) and phi-3-vision are not "
            "mapped; phi-3-mini/medium and phi-4-mini import via the "
            "llama path")
    if has("Phi3") or mt == "phi3":
        # Phi-3/Phi-4-mini = llama graph + fused qkv/gate_up checkpoint
        # tensors (split on import) + longrope (su) scaling and optional
        # partial rotary read from the config
        return "llama"
    if has("Phi") or mt == "phi":
        return "phi"
    if has("Baichuan") or mt == "baichuan":
        return "baichuan"
    if has("GPT2") or mt == "gpt2":
        return "gpt2"
    if has("Bloom") or mt == "bloom":
        return "bloom"
    if has("Falcon") or has("RWForCausalLM") or mt in ("falcon", "RefinedWeb",
                                                       "RefinedWebModel"):
        return "falcon"
    if has("OPT") or mt == "opt":
        return "opt"
    raise ValueError(f"unsupported architecture {archs or mt!r}")


_LOADERS = {
    "llama": load_hf_llama,
    "gemma": load_hf_gemma,
    "deepseek": load_hf_deepseek,
    "mixtral": load_hf_mixtral,
    "gpt2": load_hf_gpt2,
    "gptj": load_hf_gptj,
    "gptneox": load_hf_gptneox,
    "phi": load_hf_phi,
    "baichuan": load_hf_baichuan,
    "bloom": load_hf_bloom,
    "falcon": load_hf_falcon,
    "opt": load_hf_opt,
}


def load_hf_model(model_dir: str, dtype=jnp.bfloat16):
    return _LOADERS[detect_architecture(model_dir)](model_dir, dtype=dtype)
