from .quantization_config import (
    RtnConfig,
    GPTQConfig,
    AwqConfig,
    TeqConfig,
    AutoRoundConfig,
)
from .modeling_auto import AutoModelForCausalLM, save_low_bit, load_low_bit

__all__ = ["RtnConfig", "GPTQConfig", "AwqConfig", "TeqConfig",
           "AutoRoundConfig", "AutoModelForCausalLM", "save_low_bit",
           "load_low_bit"]
