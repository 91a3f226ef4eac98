"""HF compressed-tensors export.

Parity target: reference ``export_hf2compressored_model``
(torch/export/export_hf.py:89) — emit a checkpoint in the HF
``compressed-tensors`` scheme (the format vLLM and HF transformers consume
for int4/int8 "pack-quantized" weights): per-module ``weight_packed`` int32
(values packed along the input dim, torch [out, in] orientation),
``weight_scale``, optional ``weight_zero_point``, ``weight_shape``, plus a
``quantization_config`` block for config.json.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..common import logger
from ..layers.module_utils import named_modules
from ..layers.woq_linear import WOQLinear
from ..ops.packing import unpack_to_codes


def _pack_rows(codes_unsigned: np.ndarray, bits: int) -> np.ndarray:
    """[N, K] unsigned codes -> int32 [N, K*bits/32] packed along K."""
    P = 32 // bits
    N, K = codes_unsigned.shape
    mask = (1 << bits) - 1
    out = np.zeros((N, K // P), dtype=np.int64)
    for s in range(P):
        out |= (codes_unsigned[:, s::P].astype(np.int64) & mask) << (bits * s)
    return out.astype(np.int32)


def export_compressed_tensors(model, output_dir: str,
                              ignore: tuple = ("lm_head",)) -> None:
    """Write the quantized Linears of ``model`` as a compressed-tensors
    checkpoint fragment (model.safetensors + quantization_config.json)."""
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    tensors: dict = {}
    modules = []
    groups_seen: set = set()
    for path, mod in named_modules(model):
        if not isinstance(mod, WOQLinear) or mod.wdtype != "int":
            continue
        if getattr(mod, "pre_scale", None) is not None:
            raise ValueError(
                f"{path} carries a runtime pre_scale (unfolded AWQ/TEQ "
                "smoothing); compressed-tensors has no field for it and "
                "exporting would silently change numerics. Save with the "
                "default format instead, or re-quantize with foldable "
                "absorb scales.")
        if mod.packed_weight().perm is not None:
            raise ValueError(
                f"{path} stores rows in a permuted (act-order/GAR) layout; "
                "compressed-tensors has no g_idx to carry the permutation. "
                "Export with save(..., format='gptq') instead.")
        bits, group_size = mod.bits, mod.group_size
        sym = mod.zeros is None
        groups_seen.add((bits, group_size, sym))
        codes = np.asarray(jax.device_get(unpack_to_codes(mod.packed_weight())))
        half = 1 << (bits - 1)
        unsigned = (codes.astype(np.int32) + half).astype(np.uint8)
        # torch orientation [out, in]
        tensors[f"{path}.weight_packed"] = _pack_rows(unsigned.T, bits)
        from ..ops.packing import effective_scales
        tensors[f"{path}.weight_scale"] = np.asarray(
            jax.device_get(effective_scales(mod.packed_weight()))
        ).T.astype(np.float16)
        if not sym:
            zp = np.asarray(jax.device_get(mod.zeros[...])).T + half
            tensors[f"{path}.weight_zero_point"] = zp.astype(np.int8)
        tensors[f"{path}.weight_shape"] = np.asarray(
            [mod.out_features, mod.in_features], dtype=np.int64)
        if mod.bias is not None:
            tensors[f"{path}.bias"] = np.asarray(
                jax.device_get(mod.bias[...])).astype(np.float16)
        modules.append(path)
    if not modules:
        raise ValueError(
            "no int-quantized WOQLinear modules to export (codebook dtypes "
            "like nf4/fp4 have no compressed-tensors pack-quantized "
            "encoding — use the default save format)")
    if len(groups_seen) > 1:
        raise ValueError(
            "compressed-tensors pack-quantized declares ONE uniform "
            f"(bits, group_size, sym) group but the model has {sorted(groups_seen)}; "
            "a mixed-precision checkpoint would be unpacked as garbage by "
            "consumers. Use the default save format for mixed models.")
    bits, group_size, sym = next(iter(groups_seen))
    save_file(tensors, os.path.join(output_dir, "model.safetensors"))

    qcfg = {
        "quant_method": "compressed-tensors",
        "format": "pack-quantized",
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {
                    "num_bits": bits,
                    "type": "int",
                    "symmetric": sym,
                    "strategy": "group",
                    "group_size": group_size,
                },
            }
        },
        "ignore": list(ignore),
    }
    with open(os.path.join(output_dir, "quantization_config.json"), "w") as f:
        json.dump(qcfg, f, indent=2)
    logger.info("Exported %d modules as compressed-tensors to %s",
                len(modules), output_dir)


def export_fp8_compressed_tensors(model, output_dir: str,
                                  ignore: tuple = ("lm_head",)) -> None:
    """Write the FP8Linear modules of ``model`` as a vLLM-compatible
    ``compressed-tensors`` float-quantized checkpoint.

    Parity target: reference ``convert_weight_to_vllm_compatible`` /
    ``convert_config_to_vllm_compatible``
    (torch/algorithms/fp8_quant/save_load.py:208-300): per module a
    ``weight`` (fp8_e4m3, torch [out, in] orientation), ``weight_scale``
    (f32 scalar, or [N, 1] for per-channel → strategy "channel") and, for
    static activations, a scalar ``input_scale``; plus the llm-compressor
    ``quantization_config`` scheme block. KV-cache scales are NOT emitted:
    this framework's fp8 KV quantization is per-token dynamic
    (models/llama._kv_quant), so there is no calibrated static kv_scale —
    vLLM recomputes its own.
    """
    import torch
    from safetensors.torch import save_file as save_file_pt

    from ..layers.qlinear import FP8Linear

    os.makedirs(output_dir, exist_ok=True)
    tensors: dict = {}
    modules = []
    schemes: set = set()
    for path, mod in named_modules(model):
        if not isinstance(mod, FP8Linear):
            continue
        if mod.dtype_name != "fp8_e4m3":
            raise ValueError(
                f"{path} is {mod.dtype_name}; vLLM float-quantized "
                "checkpoints are fp8_e4m3-only")
        if not mod.act_dynamic and mod.act_granularity == "pcs":
            raise ValueError(
                f"{path} uses static per-channel activation scales; "
                "compressed-tensors float-quantized has no per-channel "
                "input_scale field — use pts or dynamic act scales")
        w = np.asarray(jax.device_get(mod.w_fp8[...].view(jnp.uint8)))
        # torch orientation [out, in]
        tensors[f"{path}.weight"] = torch.from_numpy(
            np.ascontiguousarray(w.T)).view(torch.float8_e4m3fn)
        ws = np.asarray(jax.device_get(mod.w_scale[...]), np.float32)
        per_channel = ws.size > 1
        tensors[f"{path}.weight_scale"] = torch.from_numpy(
            np.ascontiguousarray(ws.reshape(-1, 1) if per_channel
                                 else ws.reshape(())))
        if not mod.act_dynamic:
            a = np.asarray(jax.device_get(mod.act_scale[...]), np.float32)
            tensors[f"{path}.input_scale"] = torch.from_numpy(
                np.ascontiguousarray(a.reshape(())))
        if mod.bias is not None:
            tensors[f"{path}.bias"] = torch.from_numpy(np.asarray(
                jax.device_get(mod.bias[...]), np.float32))
        schemes.add(("channel" if per_channel else "tensor",
                     bool(mod.act_dynamic)))
        modules.append(path)
    if not modules:
        raise ValueError("no FP8Linear modules to export — run the FP8 "
                         "flow (FP8Config) first")
    if len(schemes) > 1:
        raise ValueError(
            "compressed-tensors declares ONE scheme group but the model "
            f"mixes {sorted(schemes)}; unify the fp8 scale_method first")
    w_strategy, act_dynamic = next(iter(schemes))
    save_file_pt(tensors, os.path.join(output_dir, "model.safetensors"))

    def _scheme(dynamic, strategy):
        return {"actorder": None, "block_structure": None,
                "dynamic": dynamic, "group_size": None, "num_bits": 8,
                "observer": None if dynamic else "minmax",
                "observer_kwargs": {}, "strategy": strategy,
                "symmetric": True, "type": "float"}

    qcfg = {
        "quant_method": "compressed-tensors",
        "format": "float-quantized",
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": _scheme(False, w_strategy),
                "input_activations": _scheme(act_dynamic, "tensor"),
                "output_activations": None,
            }
        },
        "ignore": list(ignore),
    }
    with open(os.path.join(output_dir, "quantization_config.json"), "w") as f:
        json.dump(qcfg, f, indent=2)
    logger.info("Exported %d FP8 modules as compressed-tensors "
                "(float-quantized) to %s", len(modules), output_dir)


def load_fp8_compressed_tensors(input_dir: str, model):
    """Load a vLLM/llm-compressor float-quantized fp8 checkpoint (as
    written by ``export_fp8_compressed_tensors`` or by llm-compressor
    itself) into a matching fp model skeleton: swaps each referenced
    Linear for an ``FP8Linear`` carrying the checkpoint's exact fp8 codes
    and scales. Returns the mutated model."""
    import jax.numpy as jnp
    from safetensors import safe_open

    from ..layers.module_utils import get_module, replace_module
    from ..layers.qlinear import FP8Linear, fp8_dtype

    with open(os.path.join(input_dir, "quantization_config.json")) as f:
        qcfg = json.load(f)
    assert qcfg.get("format") == "float-quantized", qcfg.get("format")
    group = qcfg["config_groups"]["group_0"]
    act_dynamic = bool(group["input_activations"]["dynamic"])

    import ml_dtypes
    import torch

    raw: dict = {}
    with safe_open(os.path.join(input_dir, "model.safetensors"),
                   framework="pt") as f:
        for key in f.keys():
            t = f.get_tensor(key)
            if t.dtype == torch.float8_e4m3fn:
                raw[key] = t.view(torch.uint8).numpy().view(
                    ml_dtypes.float8_e4m3fn)
            else:
                raw[key] = t.float().numpy()

    paths = sorted({k.rsplit(".", 1)[0] for k in raw if k.endswith(".weight")})
    n = 0
    for path in paths:
        w8 = raw[f"{path}.weight"]  # [out, in] fp8
        ws = raw[f"{path}.weight_scale"]
        ws = ws.reshape(-1) if ws.ndim > 0 and ws.size > 1 else np.float32(
            ws.reshape(()))
        a_in = raw.get(f"{path}.input_scale")
        bias = raw.get(f"{path}.bias")
        fdt = fp8_dtype("fp8_e4m3")
        fp8_max = float(jnp.finfo(fdt).max)
        kernel = jnp.asarray(w8.T.astype(np.float32) * (
            np.asarray(ws)[None, :] if np.ndim(ws) == 1 else float(ws)))
        amax = (float(a_in) * fp8_max) if a_in is not None else 1.0
        mod = FP8Linear(kernel, jnp.float32(amax),
                        bias=None if bias is None else jnp.asarray(bias),
                        per_channel_weight=np.ndim(ws) == 1,
                        act_dynamic=act_dynamic, pow2_scales=False)
        # pin the EXACT checkpoint codes/scales (the constructor re-derives
        # them from the dequantized kernel; rounding must not drift)
        mod.w_fp8[...] = jnp.asarray(w8.view(np.uint8).T).view(fdt)
        mod.w_scale[...] = jnp.asarray(ws, jnp.float32)
        if a_in is not None:
            mod.act_scale[...] = jnp.asarray(float(a_in), jnp.float32)
        replace_module(model, path, mod)
        n += 1
    logger.info("Loaded %d FP8 modules from %s", n, input_dir)
    return model
