"""Algorithm registry: config name → entry function.

Parity: the reference's ``@register_algo``/``algos_mapping`` dispatch
(neural_compressor/torch/utils/utility.py:48-78) and the entry adapters in
torch/quantization/algorithm_entry.py. Entries are imported lazily on first
dispatch so importing the package stays fast.
"""

from __future__ import annotations

import importlib
from typing import Callable

algos_mapping: dict[str, Callable] = {}

# algo name -> module that defines/registers its entry
_LAZY_ENTRIES = {
    "rtn": ".rtn",
    "gptq": ".gptq",
    "awq": ".awq",
    "teq": ".teq",
    "autoround": ".autoround",
    "hqq": ".hqq",
    "smooth_quant": ".smooth_quant",
    "static_quant": ".static_quant",
    "dynamic_quant": ".dynamic_quant",
    "fp8_quant": ".fp8",
    "mx_quant": ".mx",
    "mixed_precision": ".mixed_precision",
    "kv_cache": ".kv_cache",
    "qat": ".qat",
    "hybrid_gptq": ".hybrid_gptq",
}


def register_algo(name: str) -> Callable:
    def decorator(fn: Callable) -> Callable:
        algos_mapping[name] = fn
        return fn

    return decorator


def get_algo_entry(name: str) -> Callable:
    if name not in algos_mapping and name in _LAZY_ENTRIES:
        importlib.import_module(_LAZY_ENTRIES[name], package=__name__)
    if name not in algos_mapping:
        raise KeyError(f"no algorithm registered under {name!r}")
    return algos_mapping[name]


def known_algos() -> list[str]:
    return sorted(set(algos_mapping) | set(_LAZY_ENTRIES))
