"""Shared helpers for algorithm entries."""

from __future__ import annotations

import jax
from flax import nnx

from ..common import logger
from ..common.utility import Statistics
from ..layers.module_utils import named_modules, module_type_name


def extract_linear(mod) -> tuple[jax.Array, jax.Array | None] | None:
    """Return ``(kernel [K,N], bias|None)`` from a Linear-like NNX module."""
    kernel = getattr(mod, "kernel", None)
    if kernel is None:
        return None
    k = kernel[...] if isinstance(kernel, nnx.Variable) else kernel
    if k.ndim != 2:
        return None
    bias = getattr(mod, "bias", None)
    if bias is not None:
        bias = bias[...] if isinstance(bias, nnx.Variable) else bias
    return k, bias


def set_linear_kernel(mod, new_kernel) -> None:
    if isinstance(mod.kernel, nnx.Variable):
        mod.kernel[...] = new_kernel.astype(mod.kernel[...].dtype)
    else:
        mod.kernel = new_kernel


def _mod_dtype(mod) -> str:
    t = module_type_name(mod)
    if hasattr(mod, "wdtype") and hasattr(mod, "bits"):
        d = mod.wdtype
        return f"int{mod.bits}" if d == "int" else d
    if t == "FP8Linear":
        return mod.dtype_name
    if t in ("DynamicQuantLinear", "StaticQuantLinear", "StaticQuantConv"):
        return "int8 (W8A8)"
    if t == "MXLinear":
        return getattr(mod, "act_dtype", "mx")
    if t == "HalfPrecisionLinear":
        import jax.numpy as jnp

        return jnp.dtype(mod.dtype).name
    return "fp"


def dump_op_stats(model) -> None:
    """Op-type/dtype summary table after quantization — parity with the
    reference's ``dump_model_op_stats`` (torch/utils/utility.py:204-257)."""
    counts: dict[tuple[str, str], int] = {}
    for name, mod in named_modules(model):
        if not name:
            continue
        key = (module_type_name(mod), _mod_dtype(mod))
        counts[key] = counts.get(key, 0) + 1
    rows = [(t, d, n) for (t, d), n in sorted(counts.items())]
    if rows:
        Statistics(rows, header="Mixed Precision Statistics",
                   field_names=["Op Type", "DType", "Count"]).print_stat()
