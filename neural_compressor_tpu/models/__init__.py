"""Model zoo: TPU-native NNX implementations of the LLM families the
reference's recipes cover (llama/gpt2/opt/mistral — docs/source/llm_recipes.md),
with tensor-parallel sharding rules and HF checkpoint import."""

from .llama import LlamaConfig, LlamaForCausalLM, LLAMA_PRESETS
from .gpt2 import GPT2Config, GPT2LMHeadModel
from .mixtral import MixtralConfig, MixtralForCausalLM, MIXTRAL_PRESETS
from .opt import OPTConfig, OPTForCausalLM, OPT_PRESETS
from .sharding import make_mesh, shard_model, llama_partition_rules

__all__ = [
    "LlamaConfig", "LlamaForCausalLM", "LLAMA_PRESETS",
    "GPT2Config", "GPT2LMHeadModel",
    "MixtralConfig", "MixtralForCausalLM", "MIXTRAL_PRESETS",
    "OPTConfig", "OPTForCausalLM", "OPT_PRESETS",
    "make_mesh", "shard_model", "llama_partition_rules",
]
