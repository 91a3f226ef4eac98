"""Save/load of quantized models.

Parity target: reference WOQ save/load (torch/algorithms/weight_only/
save_load.py:56-146 — INC format + HF/optimum GPTQ interchange) and the
save/load routing entry (torch/quantization/save_load_entry.py).

Formats:
  * ``default`` — one ``quant_model.safetensors`` holding every quantized
    tensor (paths flattened with '/'), plus ``quant_config.json`` with
    per-module reconstruction metadata. Loading takes the fp model skeleton
    and swaps in quantized modules.
  * ``gptq`` — optimum/AutoGPTQ-compatible tensors (qweight int32 packed,
    qzeros −1 offset, fp16 scales, g_idx) for WOQLinear modules, consumable
    by the HF ecosystem; plus import back.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..common import logger
from ..layers.module_utils import named_modules, replace_module
from ..layers.qlinear import (
    DynamicQuantLinear,
    FP8Linear,
    HalfPrecisionLinear,
    StaticQuantLinear,
    fp8_dtype,
)
from ..layers.woq_linear import WOQLinear
from ..ops.packing import PackedWeight, from_gptq_layout, to_gptq_layout

WEIGHTS_NAME = "quant_model.safetensors"
CONFIG_NAME = "quant_config.json"

_QUANT_TYPES = ("WOQLinear", "W4A8Linear", "DynamicQuantLinear",
                "StaticQuantLinear", "FP8Linear", "HalfPrecisionLinear",
                "MXLinear", "WOQConv", "StaticQuantConv", "WOQLinearGeneral")


def _conv_spec_json(spec) -> dict:
    d = spec._asdict()
    if not isinstance(d["padding"], str):
        d["padding"] = [list(p) for p in d["padding"]]
    return {k: (list(v) if isinstance(v, tuple) else v)
            for k, v in d.items()}


def _conv_spec_from_json(d) -> "object":
    from ..layers.qconv import ConvSpec

    pad = d["padding"]
    if not isinstance(pad, str):
        pad = tuple(tuple(p) for p in pad)
    return ConvSpec(
        kernel_shape=tuple(d["kernel_shape"]),
        strides=tuple(d["strides"]), padding=pad,
        input_dilation=tuple(d["input_dilation"]),
        kernel_dilation=tuple(d["kernel_dilation"]),
        feature_group_count=int(d["feature_group_count"]))


def _store(tensors: dict, path: str, name: str, arr) -> None:
    a = np.asarray(jax.device_get(arr))
    if a.dtype.name in ("bfloat16",):
        tensors[f"{path}/{name}:bf16"] = a.view(np.uint16)
    elif a.dtype.name.startswith("float8"):
        tensors[f"{path}/{name}:{a.dtype.name}"] = a.view(np.uint8)
    else:
        tensors[f"{path}/{name}"] = a


def _module_tensors(mod) -> dict:
    out = {}
    for attr, val in vars(mod).items():
        if isinstance(val, nnx.Variable):
            out[attr] = val[...]
    return out


def _module_meta(mod) -> dict:
    t = type(mod).__name__
    meta = {"type": t}
    for attr in ("in_features", "out_features", "bits", "group_size",
                 "wdtype", "layout", "impl", "dtype_name", "act_bits",
                 "act_dtype", "blocksize", "weight_only", "act_dynamic",
                 "scale_method", "per_channel_weight", "act_granularity"):
        if hasattr(mod, attr):
            v = getattr(mod, attr)
            if isinstance(v, (int, float, str, bool)):
                meta[attr] = v
    if t == "HalfPrecisionLinear":
        meta["dtype"] = jnp.dtype(mod.dtype).name
    if t in ("WOQConv", "StaticQuantConv"):
        meta["conv_spec"] = _conv_spec_json(mod.conv_spec)
    if t == "WOQLinearGeneral":
        meta["out_shape"] = list(mod.out_shape)
        meta["n_in_dims"] = mod.n_in_dims
    return meta


def save(model, output_dir: str, format: str = "default") -> None:
    """Serialize all quantized modules of ``model`` to ``output_dir``."""
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    if format in ("gptq", "huggingface"):
        return _save_gptq(model, output_dir)

    tensors: dict = {}
    metas: dict = {}
    for path, mod in named_modules(model):
        if not path or type(mod).__name__ not in _QUANT_TYPES:
            continue
        metas[path] = _module_meta(mod)
        for name, arr in _module_tensors(mod).items():
            _store(tensors, path, name, arr)
    save_file(tensors, os.path.join(output_dir, WEIGHTS_NAME))
    with open(os.path.join(output_dir, CONFIG_NAME), "w") as f:
        json.dump({"format": "default", "modules": metas}, f, indent=2)
    logger.info("Saved %d quantized modules to %s", len(metas), output_dir)


def load_tensor_file(input_dir: str, base: str = WEIGHTS_NAME) -> dict:
    """Read a safetensors file that may have been shard-split by the
    streaming quantizers' bounded-memory writer (``<base>.index.json``)."""
    from safetensors.numpy import load_file

    index = os.path.join(input_dir, f"{base}.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        out: dict = {}
        for shard in sorted(set(weight_map.values())):
            out.update(load_file(os.path.join(input_dir, shard)))
        return out
    return load_file(os.path.join(input_dir, base))


def _restore_array(key: str, arr: np.ndarray):
    if ":" in key.rsplit("/", 1)[-1]:
        _, tag = key.rsplit(":", 1)
        if tag == "bf16":
            return jnp.asarray(arr.view(np.uint16)).view(jnp.bfloat16)
        if tag.startswith("float8"):
            return jnp.asarray(arr).view(jnp.dtype(tag))
    return jnp.asarray(arr)


def _rebuild(meta: dict, tensors: dict):
    t = meta["type"]
    bias = tensors.get("bias")
    if t in ("WOQLinear", "W4A8Linear", "WOQConv", "WOQLinearGeneral"):
        from ..layers.qconv import WOQConv, WOQLinearGeneral
        from ..layers.woq_linear import W4A8Linear

        pw = PackedWeight(
            packed=tensors["packed"], scales=tensors["scales"],
            zeros=tensors.get("zeros"), bits=meta["bits"],
            group_size=meta["group_size"], dtype=meta["wdtype"],
            orig_shape=(meta["in_features"], meta["out_features"]),
            layout=meta["layout"], perm=tensors.get("perm"),
            sq_scales=tensors.get("sq_scales"),
            sq_zeros=tensors.get("sq_zeros"))
        if t == "WOQConv":
            return WOQConv(pw, _conv_spec_from_json(meta["conv_spec"]),
                           bias=bias)
        if t == "WOQLinearGeneral":
            return WOQLinearGeneral(pw, tuple(meta["out_shape"]),
                                    meta["n_in_dims"],
                                    bias=tensors.get("bias_g"))
        cls = W4A8Linear if t == "W4A8Linear" else WOQLinear
        return cls(pw, bias=bias, impl=meta.get("impl", "auto"),
                   pre_scale=tensors.get("pre_scale"))
    if t == "StaticQuantConv":
        from ..layers.qconv import StaticQuantConv

        spec = _conv_spec_from_json(meta["conv_spec"])
        obj = StaticQuantConv(
            jnp.zeros((int(np.prod(spec.kernel_shape[:-1])),
                       spec.kernel_shape[-1]), jnp.float32),
            tensors["act_scale"], spec, bias=bias)
        obj.w_int8[...] = tensors["w_int8"]
        obj.w_scale[...] = tensors["w_scale"]
        return obj
    K, N = meta["in_features"], meta["out_features"]
    zeros_k = jnp.zeros((K, N), jnp.float32)
    if t == "DynamicQuantLinear":
        obj = DynamicQuantLinear(zeros_k, bias=bias,
                                 act_bits=meta.get("act_bits", 8))
        obj.w_int8[...] = tensors["w_int8"]
        obj.w_scale[...] = tensors["w_scale"]
        return obj
    if t == "StaticQuantLinear":
        obj = StaticQuantLinear(
            zeros_k, tensors["act_scale"], bias=bias,
            act_zero_point=tensors.get("act_zp"))
        obj.w_int8[...] = tensors["w_int8"]
        obj.w_scale[...] = tensors["w_scale"]
        if obj.w_colsum is not None:
            # the placeholder kernel was zeros; refresh from the real codes
            obj.w_colsum[...] = tensors.get(
                "w_colsum",
                jnp.sum(jnp.asarray(tensors["w_int8"]).astype(jnp.int32),
                        axis=0).astype(jnp.float32))
        return obj
    if t == "FP8Linear":
        obj = FP8Linear(zeros_k, jnp.ones_like(tensors["act_scale"]),
                        bias=bias, dtype_name=meta["dtype_name"],
                        act_dynamic=meta.get("act_dynamic", False),
                        per_channel_weight=meta.get("per_channel_weight",
                                                    False),
                        scale_method=meta.get("scale_method"))
        w = tensors["w_fp8"]
        if w.dtype == jnp.uint8:
            w = w.view(fp8_dtype(meta["dtype_name"]))
        obj.w_fp8[...] = w
        obj.w_scale[...] = tensors["w_scale"]
        obj.act_scale[...] = tensors["act_scale"]
        return obj
    if t == "HalfPrecisionLinear":
        return HalfPrecisionLinear(tensors["kernel"], bias=bias,
                                   dtype=jnp.dtype(meta["dtype"]))
    if t == "MXLinear":
        from ..algorithms.mx import MXLinear

        obj = MXLinear(zeros_k.astype(jnp.bfloat16), bias=bias,
                       w_dtype=meta.get("w_dtype", "mxfp8_e4m3"),
                       act_dtype=meta.get("act_dtype", "mxfp8_e4m3"),
                       blocksize=meta.get("blocksize", 32),
                       weight_only=meta.get("weight_only", False))
        obj.kernel[...] = tensors["kernel"]
        return obj
    raise ValueError(f"unknown quantized module type {t!r}")


def load(input_dir: str, model):
    """Load quantized modules into a matching fp model skeleton (mutates
    and returns ``model``)."""
    from safetensors.numpy import load_file

    with open(os.path.join(input_dir, CONFIG_NAME)) as f:
        cfg = json.load(f)
    if cfg.get("format") == "gptq":
        return _load_gptq(input_dir, model, cfg)
    raw = load_tensor_file(input_dir, WEIGHTS_NAME)
    per_module: dict[str, dict] = {}
    for key, arr in raw.items():
        path, name = key.rsplit("/", 1)
        name = name.split(":", 1)[0]
        per_module.setdefault(path, {})[name] = _restore_array(key, arr)
    n = 0
    for path, meta in cfg["modules"].items():
        new = _rebuild(meta, per_module.get(path, {}))
        replace_module(model, path, new)
        _drop_dead_split_projections(model, path)
        n += 1
    logger.info("Loaded %d quantized modules from %s", n, input_dir)
    return model


def _drop_dead_split_projections(model, path: str) -> None:
    """Fused checkpoints: drop the skeleton's now-dead split projections so
    the fp q/k/v (or gate/up) weights don't stay resident next to the fused
    quantized module."""
    if path.endswith(".qkv_proj"):
        parent = path.rsplit(".", 1)[0]
        for dead in ("q_proj", "k_proj", "v_proj"):
            replace_module(model, f"{parent}.{dead}", None)
    elif path.endswith(".gate_up_proj"):
        parent = path.rsplit(".", 1)[0]
        for dead in ("gate_proj", "up_proj"):
            replace_module(model, f"{parent}.{dead}", None)


# ---------------------------------------------------------------------------
# GPTQ / optimum interchange
# ---------------------------------------------------------------------------

def _save_gptq(model, output_dir: str) -> None:
    from safetensors.numpy import save_file

    tensors: dict = {}
    metas: dict = {}
    unexportable = []
    for path, mod in named_modules(model):
        tname = type(mod).__name__
        if not path or tname not in _QUANT_TYPES:
            continue
        if not isinstance(mod, WOQLinear):
            if tname == "HalfPrecisionLinear":
                # a precision hint, not quantized state — the fp skeleton
                # recreates it losslessly enough; just note it
                logger.warning("GPTQ save: %s (%s) is not carried by the "
                               "optimum layout; it reloads as the "
                               "skeleton's fp module", path, tname)
            else:
                unexportable.append((path, tname))
            continue
        if getattr(mod, "pre_scale", None) is not None:
            raise ValueError(
                f"{path} carries a runtime pre_scale (unfolded AWQ/TEQ "
                "smoothing); the GPTQ/optimum layout has no field for it "
                "and the reloaded model would be silently wrong. Save "
                "with the default format instead.")
        gl = to_gptq_layout(mod.packed_weight())
        for name, arr in gl.items():
            tensors[f"{path}.{name}"] = arr
        if mod.bias is not None:
            tensors[f"{path}.bias"] = np.asarray(
                jax.device_get(mod.bias[...])).astype(np.float16)
        metas[path] = {"bits": mod.bits, "group_size": mod.group_size,
                       "sym": mod.zeros is None,
                       "in_features": mod.in_features,
                       "out_features": mod.out_features}
    if unexportable:
        raise ValueError(
            "GPTQ/optimum layout only carries weight-only (WOQLinear) "
            f"modules; the model also has {unexportable[:5]} — a round-trip "
            "would silently revert them to fp. Save with the default "
            "format instead.")
    save_file(tensors, os.path.join(output_dir, "model.safetensors"))
    with open(os.path.join(output_dir, CONFIG_NAME), "w") as f:
        json.dump({"format": "gptq", "modules": metas}, f, indent=2)
    logger.info("Saved %d modules in GPTQ/optimum layout to %s",
                len(metas), output_dir)


def _load_gptq(input_dir: str, model, cfg: dict):
    from safetensors.numpy import load_file

    raw = load_file(os.path.join(input_dir, "model.safetensors"))
    n = 0
    for path, meta in cfg["modules"].items():
        pw = from_gptq_layout(
            raw[f"{path}.qweight"], raw[f"{path}.qzeros"],
            raw[f"{path}.scales"], raw.get(f"{path}.g_idx"),
            bits=meta["bits"], sym=meta["sym"])
        bias = raw.get(f"{path}.bias")
        bias = jnp.asarray(bias.astype(np.float32)) if bias is not None else None
        replace_module(model, path, WOQLinear(pw, bias=bias))
        _drop_dead_split_projections(model, path)
        n += 1
    logger.info("Loaded %d GPTQ-layout modules from %s (serving upgrades "
                "like W4A8/s4 are layout-local: re-apply to_w4a8_serving "
                "after loading)", n, input_dir)
    return model


def load_gptq_checkpoint(input_dir: str, model):
    """Load an optimum/AutoGPTQ-layout checkpoint (as written by
    ``save(..., format="gptq")`` or by the HF ecosystem) into a fp model
    skeleton. Handles act-order (non-contiguous ``g_idx``) checkpoints by
    storing the row permutation on the imported ``WOQLinear`` modules."""
    with open(os.path.join(input_dir, CONFIG_NAME)) as f:
        cfg = json.load(f)
    return _load_gptq(input_dir, model, cfg)


def load_hf_gptq_checkpoint(model_dir: str, dtype=jnp.bfloat16):
    """Load a GPTQ-quantized HF checkpoint (AutoGPTQ/optimum layout named
    by ``quantization_config.quant_method == "gptq"`` — per-projection
    qweight/qzeros/scales/g_idx tensors) into WOQLinear modules.
    Llama-family architectures. Reference: modeling_auto.py:337 routes
    pre-quantized HF checkpoints by quant_method the same way."""
    from ..layers.module_utils import get_module
    from ..models.hf_import import (_assign_llama_param,
                                    _iter_checkpoint_tensors,
                                    detect_architecture,
                                    llama_config_from_hf)
    from ..models.llama import LlamaForCausalLM

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    qc = hf.get("quantization_config") or {}
    assert qc.get("quant_method") == "gptq", (
        f"not a GPTQ checkpoint: quantization_config={qc!r}")
    bits = int(qc.get("bits", 4))
    sym = bool(qc.get("sym", False))
    arch = detect_architecture(model_dir)
    assert arch == "llama", f"GPTQ import supports llama-family, got {arch}"

    cfg = llama_config_from_hf(model_dir, dtype=dtype)
    model = LlamaForCausalLM(cfg, nnx.Rngs(0))
    pend: dict[str, dict] = {}
    n_fp = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        stem, leaf = name.rsplit(".", 1)
        if leaf in ("qweight", "qzeros", "scales", "g_idx"):
            pend.setdefault(stem, {})[leaf] = np.asarray(arr)
        else:
            n_fp += _assign_llama_param(model, name, arr, dtype)
    n = 0
    for path, t in sorted(pend.items()):
        pw = from_gptq_layout(t["qweight"], t["qzeros"], t["scales"],
                              t.get("g_idx"), bits=bits, sym=sym)
        old = get_module(model, path)
        bias = (None if getattr(old, "bias", None) is None
                else old.bias[...].astype(jnp.float32))
        replace_module(model, path, WOQLinear(pw, bias=bias))
        n += 1
    logger.info("Loaded HF-GPTQ checkpoint: %d quantized modules, %d fp "
                "tensors from %s", n, n_fp, model_dir)
    return model


def load_hf_awq_checkpoint(model_dir: str, dtype=jnp.bfloat16):
    """Load an AutoAWQ ("gemm") quantized HF checkpoint — config.json with
    ``quantization_config.quant_method == "awq"`` and per-projection
    qweight/qzeros/scales tensors — into WOQLinear serving modules
    (reference ``repack_awq_and_load_state_dict``,
    transformers/models/modeling_auto.py:54,337). Llama-family
    architectures (the AWQ ecosystem's catalogue)."""
    from ..layers.module_utils import get_module
    from ..models.hf_import import (_assign_llama_param,
                                    _iter_checkpoint_tensors,
                                    detect_architecture,
                                    llama_config_from_hf)
    from ..models.llama import LlamaForCausalLM
    from ..ops.packing import from_awq_layout

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    qc = hf.get("quantization_config") or {}
    assert qc.get("quant_method") == "awq", (
        f"not an AWQ checkpoint: quantization_config={qc!r}")
    version = str(qc.get("version", "gemm")).lower()
    assert version == "gemm", f"AWQ version {version!r} unsupported (gemm only)"
    bits = int(qc.get("bits", qc.get("w_bit", 4)))
    group_size = int(qc.get("group_size", qc.get("q_group_size", 128)))
    arch = detect_architecture(model_dir)
    assert arch == "llama", f"AWQ import supports llama-family, got {arch}"

    cfg = llama_config_from_hf(model_dir, dtype=dtype)
    model = LlamaForCausalLM(cfg, nnx.Rngs(0))
    pend: dict[str, dict] = {}
    n_fp = 0
    for name, arr in _iter_checkpoint_tensors(model_dir):
        stem, leaf = name.rsplit(".", 1)
        if leaf in ("qweight", "qzeros", "scales"):
            pend.setdefault(stem, {})[leaf] = np.asarray(arr)
        else:
            n_fp += _assign_llama_param(model, name, arr, dtype)
    n = 0
    for path, t in sorted(pend.items()):
        pw = from_awq_layout(t["qweight"], t["qzeros"], t["scales"],
                             bits=bits, group_size=group_size)
        old = get_module(model, path)
        bias = (None if getattr(old, "bias", None) is None
                else old.bias[...].astype(jnp.float32))
        replace_module(model, path, WOQLinear(pw, bias=bias))
        n += 1
    logger.info("Loaded AWQ checkpoint: %d quantized modules, %d fp "
                "tensors from %s", n, n_fp, model_dir)
    return model
