from .generate import greedy_search, sample, beam_search, generate

__all__ = ["greedy_search", "sample", "beam_search", "generate"]
