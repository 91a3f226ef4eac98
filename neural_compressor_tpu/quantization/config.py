"""Algorithm config classes.

Parity target: the reference's 14 torch config classes
(neural_compressor/torch/quantization/config.py:118-2107) — same user-facing
knobs and tuning semantics (list-valued params expand into trial configs),
rebuilt on our framework-agnostic ``BaseConfig`` core for a single JAX/TPU
frontend. Op granularity is the NNX module type name (default: "Linear").
"""

from __future__ import annotations

from typing import Sequence

from ..common.config import BaseConfig, register_config, DEFAULT_WHITE_LIST

LM_HEAD_NAMES = ("lm_head", "embed_out", "output_layer")
# MoE router gates stay fp by default (tiny, accuracy-critical)
ROUTER_SUFFIXES = (".gate",)

# Op type names treated as Linear-like across the model zoo / user models.
# ObservedLinear included so convert() after prepare() still maps the ops.
LINEAR_TYPES = ("Linear", "WOQLinear", "QDQLinear", "Einsum", "LoRALinear",
                "ObservedLinear", "FakeQuantLinear",
                # Keras-3 frontend layer types (keras_api/quantize.py)
                "Dense", "EinsumDense")

# Non-Linear quantizable ops (reference Conv2d static quant, Keras conv
# layers, JAX-frontend Conv2D/EinsumDense/MHA — layers_static.py:681-770).
# Only algorithms whose entries actually convert them (RTN, static int8 —
# layers/qconv.py) include these; others stay LINEAR_TYPES so a mapped op
# is never silently skipped.
CONV_TYPES = ("Conv", "LinearGeneral",
              # Keras-3 frontend conv layer types (keras_api/quantize.py)
              "Conv2D", "DepthwiseConv2D", "SeparableConv2D")


def _lm_head_filter(mapping, quant_lm_head: bool):
    if quant_lm_head:
        return mapping
    return {
        (name, t): cfg for (name, t), cfg in mapping.items()
        if not any(h in name for h in LM_HEAD_NAMES)
    }


class _WOQBase(BaseConfig):
    """Shared fields of the weight-only configs."""

    def __init__(self, dtype="int4", bits=4, use_sym=True, group_size=32,
                 group_dim=0, use_full_range=False, use_mse_search=False,
                 use_double_quant=False, double_quant_dtype="int",
                 double_quant_bits=8, double_quant_use_sym=False,
                 double_quant_group_size=256, quant_lm_head=False,
                 white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        self.dtype = dtype
        self.bits = bits
        self.use_sym = use_sym
        self.group_size = group_size
        self.group_dim = group_dim
        self.use_full_range = use_full_range
        self.use_mse_search = use_mse_search
        self.use_double_quant = use_double_quant
        self.double_quant_dtype = double_quant_dtype
        self.double_quant_bits = double_quant_bits
        self.double_quant_use_sym = double_quant_use_sym
        self.double_quant_group_size = double_quant_group_size
        self.quant_lm_head = quant_lm_head

    @classmethod
    def supported_op_types(cls):
        return LINEAR_TYPES

    def to_config_mapping(self, model_info):
        mapping = _lm_head_filter(super().to_config_mapping(model_info),
                                  self.quant_lm_head)
        return {(n, t): c for (n, t), c in mapping.items()
                if not n.endswith(ROUTER_SUFFIXES)}

    # normalized numeric view -------------------------------------------------
    @property
    def weight_dtype(self) -> str:
        d = self.dtype
        if d.startswith("int"):
            return "int"
        return d

    @property
    def weight_bits(self) -> int:
        """Reconcile the ``dtype``/``bits`` duality. Width-encoding dtypes
        ("int8", "nf4", ...) and the ``bits`` field can disagree; the old
        behavior let the DEFAULT dtype="int4" silently override an explicit
        ``bits=8`` (the model quantized at 4 bits with no warning). Rule:
        whichever field was moved off its class default (dtype "int4" /
        bits 4) wins; two conflicting non-default values raise."""
        d, b = self.dtype, self.bits
        if not isinstance(d, str):
            return b  # unexpanded tuning list — expand() resolves it
        if d in ("nf4", "fp4", "fp4_e2m1"):
            if isinstance(b, int) and b != 4:
                raise ValueError(f"dtype={d!r} is 4-bit but bits={b}")
            return 4
        if d.startswith("int") and len(d) > 3:
            w = int(d[3:])
            if isinstance(b, int) and b != w:
                if d == "int4":
                    return b  # bits set explicitly; dtype is the default
                if b == 4:
                    return w  # dtype set explicitly; bits is the default
                raise ValueError(
                    f"conflicting dtype={d!r} ({w}-bit) and bits={b}")
            return w
        return b

    @property
    def scheme(self) -> str:
        return "sym" if self.use_sym else "asym"


@register_config("rtn", priority=70)
class RTNConfig(_WOQBase):
    """Round-to-nearest weight-only quantization (reference RTNConfig,
    torch/quantization/config.py:119-319)."""

    params_list = ("dtype", "bits", "use_sym", "group_size", "use_full_range",
                   "use_mse_search", "use_double_quant", "double_quant_bits")

    @classmethod
    def supported_op_types(cls):
        return LINEAR_TYPES + CONV_TYPES

    @classmethod
    def get_config_set_for_tuning(cls):
        return cls(dtype=["int4", "nf4"], use_sym=[True, False],
                   group_size=[32, 128])


@register_config("gptq", priority=60)
class GPTQConfig(_WOQBase):
    """Hessian-based WOQ (reference GPTQConfig, config.py:322-522)."""

    @classmethod
    def supported_op_types(cls):
        # + MHA projections (reference SUPPORTED_LAYERS includes
        # non-Linear ops, weight_only/gptq.py:45)
        return LINEAR_TYPES + ("LinearGeneral",)

    params_list = ("dtype", "bits", "use_sym", "group_size", "act_order",
                   "percdamp", "block_size")

    def __init__(self, dtype="int4", bits=4, use_sym=True, group_size=32,
                 act_order=False, hybrid_order=False, static_groups=False,
                 true_sequential=False, percdamp=0.01, block_size=128,
                 nsamples=128, use_mse_search=False, quant_lm_head=False,
                 fp8_aware=False, white_list=DEFAULT_WHITE_LIST, **kw):
        super().__init__(dtype=dtype, bits=bits, use_sym=use_sym,
                         group_size=group_size, use_mse_search=use_mse_search,
                         quant_lm_head=quant_lm_head, white_list=white_list, **kw)
        self.act_order = act_order
        self.hybrid_order = hybrid_order
        self.static_groups = static_groups
        self.true_sequential = true_sequential
        self.percdamp = percdamp
        self.block_size = block_size
        self.nsamples = nsamples
        # W4A8/fp8 protective-range quantization (reference gptq.py:1237-1248)
        self.fp8_aware = fp8_aware

    @classmethod
    def get_config_set_for_tuning(cls):
        return cls(use_sym=[True, False], group_size=[32, 128])


@register_config("awq", priority=50)
class AWQConfig(_WOQBase):
    """Activation-aware weight quantization (reference AWQConfig,
    config.py:525-682)."""

    params_list = ("dtype", "bits", "use_sym", "group_size",
                   "use_auto_scale", "use_auto_clip")

    def __init__(self, dtype="int4", bits=4, use_sym=True, group_size=32,
                 use_auto_scale=True, use_auto_clip=True, folding=False,
                 absorb_layer_dict=None, n_grid=20, quant_lm_head=False,
                 white_list=DEFAULT_WHITE_LIST, **kw):
        super().__init__(dtype=dtype, bits=bits, use_sym=use_sym,
                         group_size=group_size, quant_lm_head=quant_lm_head,
                         white_list=white_list, **kw)
        self.use_auto_scale = use_auto_scale
        self.use_auto_clip = use_auto_clip
        self.folding = folding
        self.absorb_layer_dict = absorb_layer_dict or {}
        self.n_grid = n_grid

    @classmethod
    def get_config_set_for_tuning(cls):
        return cls(use_auto_scale=[True, False], use_auto_clip=[True, False])


@register_config("teq", priority=40)
class TEQConfig(_WOQBase):
    """Trainable equivalent transformation (reference TEQConfig,
    config.py:685-831)."""

    params_list = ("dtype", "bits", "use_sym", "group_size")

    def __init__(self, dtype="int4", bits=4, use_sym=True, group_size=32,
                 absorb_layer_dict=None, folding=True, lr=1e-3,
                 train_steps=100, quant_lm_head=False,
                 white_list=DEFAULT_WHITE_LIST, **kw):
        super().__init__(dtype=dtype, bits=bits, use_sym=use_sym,
                         group_size=group_size, quant_lm_head=quant_lm_head,
                         white_list=white_list, **kw)
        self.absorb_layer_dict = absorb_layer_dict or {}
        self.folding = folding
        self.lr = lr
        self.train_steps = train_steps


@register_config("autoround", priority=45)
class AutoRoundConfig(_WOQBase):
    """Signed-gradient rounding optimization (reference AutoRoundConfig,
    config.py:834-1131; algorithm per the AutoRound paper — learnable
    rounding offsets + clip range trained per block)."""

    params_list = ("dtype", "bits", "use_sym", "group_size", "iters", "lr")

    # module-path fragments identifying non-text (vision/audio) modules in
    # multimodal models — the declarative analog of the reference's
    # per-model MLLM templates (auto_round mllm/template)
    NONTEXT_PATTERNS = ("vision_tower", "vision_model", "visual",
                        "multi_modal_projector", "image_newline",
                        "audio_tower", "patch_embed")

    def __init__(self, dtype="int4", bits=4, use_sym=True, group_size=128,
                 iters=200, lr=None, minmax_lr=None, batch_size=8,
                 seqlen=2048, nsamples=128, enable_minmax_tuning=True,
                 quant_lm_head=False, quant_nontext_module=False,
                 white_list=DEFAULT_WHITE_LIST, **kw):
        super().__init__(dtype=dtype, bits=bits, use_sym=use_sym,
                         group_size=group_size, quant_lm_head=quant_lm_head,
                         white_list=white_list, **kw)
        self.iters = iters
        self.lr = lr if lr is not None else 1.0 / max(iters, 1)
        self.minmax_lr = minmax_lr if minmax_lr is not None else self.lr
        self.batch_size = batch_size
        self.seqlen = seqlen
        self.nsamples = nsamples
        self.enable_minmax_tuning = enable_minmax_tuning
        # MLLM: quantize non-text modules too (reference
        # quant_nontext_module, torch/quantization/config.py:887-1008)
        self.quant_nontext_module = quant_nontext_module

    def to_config_mapping(self, model_info):
        mapping = super().to_config_mapping(model_info)
        if self.quant_nontext_module:
            return mapping
        return {(n, t): c for (n, t), c in mapping.items()
                if not any(p in n for p in self.NONTEXT_PATTERNS)}


@register_config("hqq", priority=30)
class HQQConfig(_WOQBase):
    """Half-quadratic quantization, data-free (reference HQQConfig,
    config.py:1626-1741)."""

    params_list = ("dtype", "bits", "group_size", "quant_zero", "quant_scale")

    def __init__(self, dtype="int4", bits=4, group_size=64, quant_zero=False,
                 quant_scale=False, scale_quant_group_size=128, iters=20,
                 beta=1e1, kappa=1.01, lp_norm=0.7, quant_lm_head=False,
                 white_list=DEFAULT_WHITE_LIST, **kw):
        super().__init__(dtype=dtype, bits=bits, use_sym=False,
                         group_size=group_size, quant_lm_head=quant_lm_head,
                         white_list=white_list, **kw)
        self.quant_zero = quant_zero
        self.quant_scale = quant_scale
        self.scale_quant_group_size = scale_quant_group_size
        self.iters = iters
        self.beta = beta
        self.kappa = kappa
        self.lp_norm = lp_norm


@register_config("smooth_quant", priority=20)
class SmoothQuantConfig(BaseConfig):
    """SmoothQuant W8A8 (reference SmoothQuantConfig, config.py:1485-1623):
    migrate activation outliers into weights with s = amax_x^a / amax_w^(1-a),
    then static-int8 quantize."""

    params_list = ("alpha", "folding")

    def __init__(self, alpha=0.5, folding=False, auto_alpha=False,
                 alpha_min=0.3, alpha_max=0.7, alpha_step=0.1,
                 act_bits=8, weight_bits=8, absorb_layer_dict=None,
                 white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        self.alpha = alpha
        self.folding = folding
        self.auto_alpha = auto_alpha
        self.alpha_min = alpha_min
        self.alpha_max = alpha_max
        self.alpha_step = alpha_step
        self.act_bits = act_bits
        self.weight_bits = weight_bits
        self.absorb_layer_dict = absorb_layer_dict or {}

    @classmethod
    def supported_op_types(cls):
        return LINEAR_TYPES

    @classmethod
    def get_config_set_for_tuning(cls):
        return cls(alpha=[0.3, 0.5, 0.7])


@register_config("static_quant", priority=15)
class INT8StaticQuantConfig(BaseConfig):
    """Static W8A8 with calibrated activation scales (reference
    INT8StaticQuantConfig, config.py:1337-1482)."""

    params_list = ("act_sym", "act_granularity", "act_algo")

    def __init__(self, act_dtype="int8", act_sym=True,
                 act_granularity="per_tensor", w_dtype="int8", w_sym=True,
                 w_granularity="per_channel", act_algo="minmax",
                 percentile=99.99, white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        self.act_dtype = act_dtype
        self.act_sym = act_sym
        self.act_granularity = act_granularity
        self.w_dtype = w_dtype
        self.w_sym = w_sym
        self.w_granularity = w_granularity
        # activation calibration algorithm (reference act_algo choices):
        # "minmax"/"maxabs" | "percentile" | "mse" (histogram-backed)
        self.act_algo = act_algo
        self.percentile = percentile

    @classmethod
    def supported_op_types(cls):
        # Conv joins Linear here (StaticQuantConv, layers/qconv.py; Keras
        # QDQActWrapper, keras_api/qlayers.py); LinearGeneral static W8A8
        # is RTN/WOQ-only for now. Keras extras: SeparableConv2D (both
        # kernels QDQ'd), pool2d (input QDQ, reference keras/layers/
        # pool2d.py) and MultiHeadAttention (attention-internal QDQ,
        # reference jax/quantization/layers_static.py:770).
        return LINEAR_TYPES + ("Conv", "Conv2D", "DepthwiseConv2D",
                               "SeparableConv2D", "AveragePooling2D",
                               "MaxPooling2D", "MultiHeadAttention")


@register_config("dynamic_quant", priority=10)
class DynamicQuantConfig(BaseConfig):
    """Dynamic W8A8: per-token act scales at runtime (reference
    DynamicQuantConfig, config.py:1252-1334)."""

    params_list = ("act_sym",)

    def __init__(self, act_dtype="int8", act_sym=True, w_dtype="int8",
                 w_sym=True, w_granularity="per_channel",
                 white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        self.act_dtype = act_dtype
        self.act_sym = act_sym
        self.w_dtype = w_dtype
        self.w_sym = w_sym
        self.w_granularity = w_granularity

    @classmethod
    def supported_op_types(cls):
        return LINEAR_TYPES


@register_config("fp8_quant", priority=25)
class FP8Config(BaseConfig):
    """FP8 two-phase (measure → quantize) flow (reference FP8Config,
    config.py:1744-1917 and fp8_quant/_quant_common/quant_config.py)."""

    params_list = ("fp8_config", "scale_method")

    def __init__(self, fp8_config="E4M3", scale_method="maxabs_hw",
                 observer="maxabs", mode="AUTO", allowlist=None,
                 blocklist=None, dump_stats_path="./fp8_stats",
                 quantize_attention=False, quantize_softmax=False,
                 measure_on_hpu=None,
                 white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        from ..algorithms import fp8_scales

        for m in ([scale_method] if isinstance(scale_method, str)
                  else scale_method):
            fp8_scales.resolve(m)  # typo'd names raise here, not at serve
        self.fp8_config = fp8_config
        self.scale_method = scale_method
        self.observer = observer
        self.mode = mode
        self.allowlist = allowlist or {"types": [], "names": []}
        self.blocklist = blocklist or {"types": [], "names": []}
        self.dump_stats_path = dump_stats_path
        # fp8 SDPA: run attention QK^T/PV on e4m3 operands (reference
        # PatchedModuleFusedSDPA / fp8 matmul+softmax patches)
        self.quantize_attention = quantize_attention
        # PatchedSoftmax analog: QDQ the attention probabilities through
        # e4m3 (helper_modules.py:1450); implies nothing without
        # quantize_attention-eligible modules but is honored zoo-wide
        self.quantize_softmax = quantize_softmax

    @classmethod
    def supported_op_types(cls):
        return LINEAR_TYPES

    def to_config_mapping(self, model_info):
        """Honor allowlist/blocklist (reference quant_config.py semantics:
        name substrings + exact type names; blocklist wins)."""
        mapping = super().to_config_mapping(model_info)
        al_names = self.allowlist.get("names") or []
        al_types = self.allowlist.get("types") or []
        bl_names = self.blocklist.get("names") or []
        bl_types = self.blocklist.get("types") or []

        def keep(name, t):
            if any(s in name for s in bl_names) or t in bl_types:
                return False
            if al_names or al_types:
                return any(s in name for s in al_names) or t in al_types
            return True

        return {(n, t): c for (n, t), c in mapping.items() if keep(n, t)}

    @property
    def dtype_name(self) -> str:
        return "fp8_e4m3" if self.fp8_config.upper() == "E4M3" else "fp8_e5m2"

    @property
    def pow2_scales(self) -> bool:
        return "hw" in self.scale_method or "pow2" in self.scale_method

    @classmethod
    def from_json_file(cls, path: str) -> "FP8Config":
        import json
        with open(path) as f:
            return cls(**json.load(f))


@register_config("mx_quant", priority=12)
class MXQuantConfig(BaseConfig):
    """Microscaling (MX) formats: shared pow2 exponent per 32-block
    (reference MXQuantConfig, config.py:1134-1249; OCP MX spec)."""

    params_list = ("w_dtype", "act_dtype")

    def __init__(self, w_dtype="mxfp8_e4m3", act_dtype="mxfp8_e4m3",
                 out_dtype="bfloat16", blocksize=32, round_method="nearest",
                 weight_only=False, white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        self.w_dtype = w_dtype
        self.act_dtype = act_dtype
        self.out_dtype = out_dtype
        self.blocksize = blocksize
        self.round_method = round_method
        self.weight_only = weight_only

    @classmethod
    def supported_op_types(cls):
        return LINEAR_TYPES


@register_config("mixed_precision", priority=5)
class MixedPrecisionConfig(BaseConfig):
    """fp16/bf16 conversion (reference MixedPrecisionConfig,
    config.py:1947-2066)."""

    params_list = ("dtype",)

    def __init__(self, dtype="bf16", white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        self.dtype = dtype

    @classmethod
    def supported_op_types(cls):
        return LINEAR_TYPES


@register_config("kv_cache", priority=8)
class KVCacheQuantConfig(BaseConfig):
    """INT8/FP8 KV-cache quantization (reference PatchedKVCache /
    PatchedVLLMKVCache, fp8_quant/_quant_common/helper_modules.py:1105-1240).
    Applies to attention modules holding a KV cache."""

    params_list = ("dtype",)

    def __init__(self, dtype="int8", per_head_scales=True,
                 per_channel_k=False, white_list=DEFAULT_WHITE_LIST):
        super().__init__(white_list=white_list)
        self.dtype = dtype
        self.per_head_scales = per_head_scales
        # int4 only: calibrated per-(kv-head, channel) K scales folded
        # into q (KIVI-style — K quantization error is channel-dominated);
        # needs a calibration run_fn
        self.per_channel_k = per_channel_k

    @classmethod
    def supported_op_types(cls):
        return None  # matched by type suffix below

    def to_config_mapping(self, model_info):
        mapping = {}
        for n, t in model_info:
            if not (t.endswith("Attention") or t.endswith("KVCache")):
                continue
            cfg = self
            for pattern, local in self._local_configs.items():
                if self._match(pattern, n, t):
                    cfg = local
                    break
            mapping[(n, t)] = cfg
        return mapping


@register_config("hybrid_gptq", priority=7)
class HybridGPTQConfig(GPTQConfig):
    """W4A8 serving: GPTQ int4 weights + int8 activations on the MXU's
    integer path (reference HybridGPTQConfig, config.py:1920-1944, and the
    mixed_low_precision package)."""

    def __init__(self, dtype="int4", bits=4, use_sym=True, group_size=128,
                 act_dtype="int8", **kw):
        if dtype not in ("int4", "int") or bits != 4:
            raise ValueError(
                f"HybridGPTQConfig is the sym-int4 W4A8 flow; dtype="
                f"{dtype!r}/bits={bits} would only downgrade the modules "
                "off the int8-MXU kernel onto the XLA fallback — use "
                "GPTQConfig for other dtypes")
        if not use_sym:
            raise ValueError(
                "HybridGPTQConfig requires use_sym=True: the W4A8 int8-MXU "
                "and TP kernels are symmetric-only (zero points would be "
                "silently dropped)")
        super().__init__(dtype=dtype, bits=bits, use_sym=True,
                         group_size=group_size, **kw)
        self.act_dtype = act_dtype


@register_config("qat", priority=6)
class QATConfig(_WOQBase):
    """Quantization-aware training config (reference StaticQuantConfig/QAT,
    config.py:2069; NVFP4/MXFP8 schemes qat/quant_utils.py:64-118).
    ``mx_format`` switches the fake-quant to an MX block format
    ("mxfp8_e4m3", "fp4", ..., or "nvfp4" for e4m3 block-16 scales)."""

    params_list = ("dtype", "bits", "group_size")

    def __init__(self, dtype="int4", bits=4, use_sym=True, group_size=32,
                 act_dtype=None, mx_format=None, quant_lm_head=False,
                 white_list=DEFAULT_WHITE_LIST, **kw):
        super().__init__(dtype=dtype, bits=bits, use_sym=use_sym,
                         group_size=group_size, quant_lm_head=quant_lm_head,
                         white_list=white_list, **kw)
        self.act_dtype = act_dtype
        self.mx_format = mx_format


# Convenience: default tuning space over all registered algos, mirrors
# reference get_all_config_set (torch/quantization/autotune.py:95).
def get_woq_tuning_config() -> list[BaseConfig]:
    """The reference's WOQ auto-tune recipe set (RTN/GPTQ/AWQ sweep)."""
    return [
        RTNConfig(dtype="int4", use_sym=True, group_size=32),
        GPTQConfig(dtype="int4", use_sym=True, group_size=32),
        AWQConfig(dtype="int4", use_sym=True, group_size=32),
    ]
