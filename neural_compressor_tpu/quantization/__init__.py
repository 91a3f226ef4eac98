from .config import (
    RTNConfig,
    GPTQConfig,
    AWQConfig,
    TEQConfig,
    AutoRoundConfig,
    HQQConfig,
    SmoothQuantConfig,
    INT8StaticQuantConfig,
    DynamicQuantConfig,
    FP8Config,
    MXQuantConfig,
    MixedPrecisionConfig,
    KVCacheQuantConfig,
    QATConfig,
    HybridGPTQConfig,
    get_woq_tuning_config,
)
from .quantize import (
    prepare,
    convert,
    quantize,
    finalize_calibration,
    prepare_qat,
)
from .autotune import autotune, get_all_config_set
from .save_load import (save, load, load_gptq_checkpoint,
                        load_hf_awq_checkpoint, load_hf_gptq_checkpoint)
from .layer_fallback import autotune_layer_fallback, rank_layer_sensitivity
