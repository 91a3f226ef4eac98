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


def _to_jnp(arr: np.ndarray, dtype) -> jnp.ndarray:
    if arr.dtype == np.uint16:  # bf16 stored raw
        return jnp.asarray(arr).view(jnp.bfloat16).astype(dtype)
    return jnp.asarray(arr).astype(dtype)


def llama_config_from_hf(model_dir: str, dtype=jnp.bfloat16) -> LlamaConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
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
        dtype=dtype,
    )


def load_hf_llama(model_dir: str, dtype=jnp.bfloat16) -> LlamaForCausalLM:
    """Build a LlamaForCausalLM and fill it from a local HF checkpoint."""
    cfg = llama_config_from_hf(model_dir, dtype=dtype)
    model = LlamaForCausalLM(cfg, nnx.Rngs(0))
    n = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
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
        if rest == "input_layernorm.weight":
            layer.input_layernorm.weight[...] = t.astype(jnp.float32)
            return 1
        if rest == "post_attention_layernorm.weight":
            layer.post_attention_layernorm.weight[...] = t.astype(jnp.float32)
            return 1
    logger.debug("skipping unknown HF tensor %s", name)
    return 0


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
        else:
            n -= 1
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
        else:
            n -= 1
    logger.info("Loaded %d HF tensors from %s", n, model_dir)
    return model


def detect_architecture(model_dir: str) -> str:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    archs = hf.get("architectures") or []
    mt = hf.get("model_type", "")
    if any("Mixtral" in a for a in archs) or mt == "mixtral":
        return "mixtral"
    if any("Llama" in a or "Mistral" in a for a in archs) or mt in (
            "llama", "mistral"):
        return "llama"
    if any("GPT2" in a for a in archs) or mt == "gpt2":
        return "gpt2"
    raise ValueError(f"unsupported architecture {archs or mt!r}")


def load_hf_model(model_dir: str, dtype=jnp.bfloat16):
    arch = detect_architecture(model_dir)
    if arch == "llama":
        return load_hf_llama(model_dir, dtype=dtype)
    if arch == "mixtral":
        return load_hf_mixtral(model_dir, dtype=dtype)
    return load_hf_gpt2(model_dir, dtype=dtype)
