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
