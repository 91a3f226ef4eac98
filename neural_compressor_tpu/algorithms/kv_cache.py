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


@register_algo("kv_cache")
def kv_cache_entry(model, configs_mapping, mode="quantize", run_fn=None,
                   run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        return model
    n = 0
    for _name, mod in named_modules(model):
        if type(mod).__name__.endswith("Attention"):
            n += 1
    # static bool attr; init_kv_cache(..., quantized=model.kv_cache_quantized)
    model.kv_cache_quantized = True
    logger.info("KV-cache quantization enabled (int8 per-token-per-head "
                "scales) for %d attention modules", n)
    return model
