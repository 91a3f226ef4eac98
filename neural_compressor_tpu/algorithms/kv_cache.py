"""KV-cache quantization entry.

Parity: reference ``PatchedKVCache``/``PatchedVLLMKVCache``
(fp8_quant/_quant_common/helper_modules.py:1105-1240). In the TPU design
the cache is a pytree the user allocates (models.llama.init_kv_cache), so
"patching" reduces to flagging the model: attention modules consume
``QuantKVCache`` transparently. This entry marks the model so serving code
allocates quantized caches.

``per_channel_k`` (int4 only, KIVI-style): prepare attaches a per-
(kv-head, channel) amax observer to every attention module; a calibration
run accumulates post-rope key stats; convert freezes them into
``kv_k_scale`` variables that the attention folds into q.

NOTE (round 5): the DEFAULT int4 cache quantizer is now asymmetric
per-(token, head, D-half) (models.llama._kv_quant4_asym), which measured
3-5x lower Δppl than both the old symmetric per-token form AND this
calibrated per-channel mode on every architecture in the battery
(tiny_gqa: default +0.054 vs per_channel_k +0.139 vs old sym +0.150 —
experiments/kv_int4_variants.py). ``per_channel_k`` remains for models
whose K channel outliers dominate at scale, but is no longer the
recommended lever."""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from ..common import logger
from ..layers.module_utils import named_modules
from . import register_algo


_KV_FORMATS = ("int8", "fp8_e4m3", "int4")


def _attention_modules(model):
    for _name, mod in named_modules(model):
        if type(mod).__name__.endswith("Attention") and hasattr(mod, "cfg"):
            yield mod


@register_algo("kv_cache")
def kv_cache_entry(model, configs_mapping, mode="quantize", run_fn=None,
                   run_args=None, example_inputs=None, config=None):
    # the mapping's config decides the cache code format; the cache is ONE
    # model-level allocation, so heterogeneous per-op KV configs cannot be
    # honored — reject them instead of silently using whichever op
    # iterates first
    variants = set()
    for (_name, _t), cfg in configs_mapping.items():
        dt = getattr(cfg, "dtype", "int8")
        if dt in ("fp8", "fp8_e4m3", "float8_e4m3"):
            dt = "fp8_e4m3"
        if dt not in _KV_FORMATS:
            raise ValueError(
                f"KVCacheQuantConfig.dtype={dt!r} unsupported; "
                f"expected one of {_KV_FORMATS}")
        variants.add((dt, bool(getattr(cfg, "per_channel_k", False))))
    if len(variants) > 1:
        raise ValueError(
            "KV-cache quantization is model-global (one cache format); the "
            f"config mapping asks for {sorted(variants)} — per-op KV "
            "granularity is unsupported, use one (dtype, per_channel_k)")
    fmt, per_channel = variants.pop() if variants else ("int8", False)
    if per_channel and fmt != "int4":
        raise ValueError("per_channel_k applies to dtype='int4' only "
                         "(int8/fp8 per-token scales are already lossless)")

    if per_channel and mode in ("prepare", "quantize"):
        for mod in _attention_modules(model):
            hkv, d = mod.cfg.num_key_value_heads, mod.cfg.head_dim
            mod.kv_k_amax = nnx.Variable(jnp.zeros((hkv, d), jnp.float32))
            mod.kv_observe = True
        if mode == "quantize":
            from .quantize_helpers import run_user_calibration

            if run_fn is None:
                raise ValueError(
                    "per_channel_k needs a calibration run_fn (or use "
                    "prepare/convert)")
            run_user_calibration(model, run_fn, run_args)
    if mode == "prepare":
        return model

    n = 0
    for mod in _attention_modules(model):
        if per_channel:
            amax = mod.kv_k_amax[...]
            if float(jnp.max(amax)) <= 0:
                raise ValueError(
                    "per_channel_k: no calibration data reached the "
                    "attention observers — run the calibration function "
                    "between prepare() and convert()")
            mod.kv_k_scale = nnx.Variable(
                jnp.where(amax <= 0, 1.0, amax / 7.0))
            mod.kv_observe = False
        n += 1
    # static attrs; init_kv_cache(..., quantized=model.kv_cache_format)
    model.kv_cache_quantized = True
    model.kv_cache_format = fmt
    logger.info("KV-cache quantization enabled (%s, %s scales) for %d "
                "attention modules", fmt,
                "per-channel-K + per-token-V" if per_channel
                else "per-token-per-head", n)
    return model
