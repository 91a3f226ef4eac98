"""Model zoo: TPU-native NNX implementations of the LLM families the
reference's recipes cover (llama/mistral/qwen2, gpt2, opt, mixtral, gpt-j,
gpt-neox/dolly/pythia, bloom, falcon, phi, baichuan-7b, gemma-1/2/3 —
docs/source/llm_recipes.md, test/jax/test_gemma3.py), with
tensor-parallel sharding rules and HF checkpoint import."""

from .llama import LlamaConfig, LlamaForCausalLM, LLAMA_PRESETS
from .gpt2 import GPT2Config, GPT2LMHeadModel
from .mixtral import MixtralConfig, MixtralForCausalLM, MIXTRAL_PRESETS
from .opt import OPTConfig, OPTForCausalLM, OPT_PRESETS
from .gptj import GPTJConfig, GPTJForCausalLM, GPTJ_PRESETS
from .bloom import BloomConfig, BloomForCausalLM, BLOOM_PRESETS
from .falcon import FalconConfig, FalconForCausalLM, FALCON_PRESETS
from .gptneox import GPTNeoXConfig, GPTNeoXForCausalLM, GPTNEOX_PRESETS
from .phi import PhiConfig, PhiForCausalLM, PHI_PRESETS
from .gemma import GemmaConfig, GemmaForCausalLM, GEMMA_PRESETS
from .deepseek import (DeepseekConfig, DeepseekForCausalLM,
                       DEEPSEEK_PRESETS, enable_mla_latent_cache)
from .vit import ViTConfig, ViTForImageClassification, VIT_PRESETS
from .llava import (LlavaConfig, LlavaForConditionalGeneration,
                    LLAVA_PRESETS)
from .sharding import make_mesh, shard_model, llama_partition_rules

__all__ = [
    "LlamaConfig", "LlamaForCausalLM", "LLAMA_PRESETS",
    "GPT2Config", "GPT2LMHeadModel",
    "MixtralConfig", "MixtralForCausalLM", "MIXTRAL_PRESETS",
    "OPTConfig", "OPTForCausalLM", "OPT_PRESETS",
    "GPTJConfig", "GPTJForCausalLM", "GPTJ_PRESETS",
    "BloomConfig", "BloomForCausalLM", "BLOOM_PRESETS",
    "FalconConfig", "FalconForCausalLM", "FALCON_PRESETS",
    "GPTNeoXConfig", "GPTNeoXForCausalLM", "GPTNEOX_PRESETS",
    "PhiConfig", "PhiForCausalLM", "PHI_PRESETS",
    "GemmaConfig", "GemmaForCausalLM", "GEMMA_PRESETS",
    "DeepseekConfig", "DeepseekForCausalLM", "DEEPSEEK_PRESETS",
    "enable_mla_latent_cache",
    "ViTConfig", "ViTForImageClassification", "VIT_PRESETS",
    "LlavaConfig", "LlavaForConditionalGeneration", "LLAVA_PRESETS",
    "make_mesh", "shard_model", "llama_partition_rules",
]
