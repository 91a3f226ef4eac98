"""neural_compressor_tpu — a TPU-native model compression framework.

Post-training quantization (RTN/GPTQ/AWQ/TEQ/AutoRound/HQQ/SmoothQuant,
static & dynamic INT8, FP8, MX microscaling, mixed precision), an
accuracy-driven auto-tuner, packed serving kernels (Pallas), sharded
serving (pjit/shard_map), and save/load in interchange formats.

Built from scratch for JAX/XLA on TPU, with feature parity against
intel/neural-compressor (the reference, /root/reference)."""

from .version import __version__
from .common import logger, set_log_level, options, TuningConfig
from .quantization import (
    RTNConfig, GPTQConfig, AWQConfig, TEQConfig, AutoRoundConfig, HQQConfig,
    SmoothQuantConfig, INT8StaticQuantConfig, DynamicQuantConfig, FP8Config,
    MXQuantConfig, MixedPrecisionConfig, KVCacheQuantConfig, QATConfig, HybridGPTQConfig,
    get_woq_tuning_config,
    prepare, convert, quantize, finalize_calibration, prepare_qat,
    autotune, get_all_config_set, save, load,
    load_gptq_checkpoint,
    load_hf_awq_checkpoint,
    load_hf_gptq_checkpoint,
)
from .quantization.fuse import fuse_for_serving
from .quantization.layer_wise import (
    quantize_hf_checkpoint_streaming,
    gptq_quantize_checkpoint_streaming,
    load_quantized_checkpoint,
)
from .quantization.export_hf import export_compressed_tensors
from .quantization.distributed_checkpoint import save_sharded, load_sharded
from .generation import generate, greedy_search, beam_search, sample
from .evaluation import evaluate_lm, perplexity
