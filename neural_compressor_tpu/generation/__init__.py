from .generate import (greedy_search, greedy_search_mllm, sample,
                       beam_search, generate)
from .speculative import (speculative_greedy_search,
                          ngram_speculative_greedy_search)

__all__ = ["greedy_search", "greedy_search_mllm", "sample",
           "beam_search", "generate",
           "speculative_greedy_search",
           "ngram_speculative_greedy_search"]
