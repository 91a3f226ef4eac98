"""Layer-wise (streaming) quantization of checkpoints larger than host RAM.

Parity target: the reference's layer-wise machinery
(neural_compressor/torch/algorithms/layer_wise/: meta-device model +
per-layer weight loading hooks + shard writer, utils.py:266-434). TPU
redesign: there is no module graph to hook — the checkpoint itself is the
iteration space. Tensors stream one at a time from the HF safetensors
shards; projection weights are quantized+packed on device and written out
incrementally; everything else passes through. Peak memory is one tensor
(plus one output shard buffer). The hardened-pickle concern of the
reference (modified_pickle.py) does not arise: only safetensors are read.

Output is self-contained: ``quant_model.safetensors`` (quantized modules, in
save_load's default format) + ``fp_tensors.safetensors`` (norms/embeddings)
+ the original ``config.json`` — loadable without the source checkpoint via
``load_quantized_checkpoint``.
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from ..common import logger
from ..layers.woq_linear import WOQLinear
from ..models.hf_import import (
    _iter_checkpoint_tensors,
    _to_jnp,
    detect_architecture,
    llama_config_from_hf,
)
from ..ops.packing import pack_qtensor
from ..ops.qtensor import quantize_tensor
from .save_load import CONFIG_NAME, _module_meta, _module_tensors, _store

FP_NAME = "fp_tensors.safetensors"


def _llama_module_path(name: str) -> str | None:
    """HF tensor name -> quantizable module path, or None to pass through."""
    if name.endswith(".weight") and any(
        p in name for p in (".q_proj.", ".k_proj.", ".v_proj.", ".o_proj.",
                            ".gate_proj.", ".up_proj.", ".down_proj.")):
        return name[: -len(".weight")]
    return None


def quantize_hf_checkpoint_streaming(model_dir: str, quant_config,
                                     output_dir: str,
                                     dtype=jnp.bfloat16) -> None:
    """Stream-quantize an HF llama checkpoint (RTN-style configs)."""
    arch = detect_architecture(model_dir)
    assert arch == "llama", "streaming path currently targets llama-family"
    os.makedirs(output_dir, exist_ok=True)
    from safetensors.numpy import save_file

    q_tensors: dict = {}
    fp_tensors: dict = {}
    metas: dict = {}
    n_q = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        mpath = _llama_module_path(name)
        quantizable = (
            mpath is not None
            and not (not quant_config.quant_lm_head
                     and any(h in name for h in ("lm_head",))))
        if quantizable:
            w = _to_jnp(arr, jnp.float32).T  # torch [out,in] -> [in,out]
            qt = quantize_tensor(
                w, bits=quant_config.weight_bits,
                group_size=quant_config.group_size,
                scheme=quant_config.scheme, dtype=quant_config.weight_dtype,
                full_range=getattr(quant_config, "use_full_range", False))
            mod = WOQLinear.from_qtensor(qt)
            metas[mpath] = _module_meta(mod)
            for tname, tarr in _module_tensors(mod).items():
                _store(q_tensors, mpath, tname, tarr)
            n_q += 1
            del w, qt, mod
        else:
            a = np.asarray(arr)
            if a.dtype == np.uint16:  # raw bf16 passes through as-is
                fp_tensors[name + ":bf16"] = a
            else:
                fp_tensors[name] = a
    save_file(q_tensors, os.path.join(output_dir, "quant_model.safetensors"))
    save_file(fp_tensors, os.path.join(output_dir, FP_NAME))
    with open(os.path.join(output_dir, CONFIG_NAME), "w") as f:
        json.dump({"format": "default", "modules": metas}, f, indent=2)
    shutil.copy(os.path.join(model_dir, "config.json"),
                os.path.join(output_dir, "config.json"))
    logger.info("Stream-quantized %d projections from %s -> %s",
                n_q, model_dir, output_dir)


def load_quantized_checkpoint(ckpt_dir: str, dtype=jnp.bfloat16):
    """Rebuild the quantized model from a streaming-quantized checkpoint
    (no source fp checkpoint required)."""
    from flax import nnx
    from safetensors.numpy import load_file

    from ..models.hf_import import _assign_llama_param
    from ..models.llama import LlamaForCausalLM
    from .save_load import load as load_quant

    cfg = llama_config_from_hf(ckpt_dir, dtype=dtype)
    model = LlamaForCausalLM(cfg, nnx.Rngs(0))
    for name, arr in load_file(os.path.join(ckpt_dir, FP_NAME)).items():
        if name.endswith(":bf16"):
            name = name[: -len(":bf16")]
        _assign_llama_param(model, name, arr, dtype)
    return load_quant(ckpt_dir, model)
