"""KV-cache quantization entry.

Parity: reference ``PatchedKVCache``/``PatchedVLLMKVCache``
(fp8_quant/_quant_common/helper_modules.py:1105-1240). In the TPU design
the cache is a pytree the user allocates (models.llama.init_kv_cache), so
"patching" reduces to flagging the model: attention modules consume
``QuantKVCache`` transparently. This entry marks the model so serving code
allocates quantized caches."""

from __future__ import annotations

from ..common import logger
from ..layers.module_utils import named_modules
from . import register_algo


_KV_FORMATS = ("int8", "fp8_e4m3", "int4")


@register_algo("kv_cache")
def kv_cache_entry(model, configs_mapping, mode="quantize", run_fn=None,
                   run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        return model
    # the mapping's config decides the cache code format (int8 | fp8_e4m3)
    fmt = "int8"
    for (_name, _t), cfg in configs_mapping.items():
        dt = getattr(cfg, "dtype", "int8")
        if dt in ("fp8", "fp8_e4m3", "float8_e4m3"):
            fmt = "fp8_e4m3"
        elif dt == "int4":
            fmt = "int4"
        elif dt not in _KV_FORMATS:
            raise ValueError(
                f"KVCacheQuantConfig.dtype={dt!r} unsupported; "
                f"expected one of {_KV_FORMATS}")
        break
    n = 0
    for _name, mod in named_modules(model):
        if type(mod).__name__.endswith("Attention"):
            n += 1
    # static attrs; init_kv_cache(..., quantized=model.kv_cache_format)
    model.kv_cache_quantized = True
    model.kv_cache_format = fmt
    logger.info("KV-cache quantization enabled (%s, per-token-per-head "
                "scales) for %d attention modules", fmt, n)
    return model
