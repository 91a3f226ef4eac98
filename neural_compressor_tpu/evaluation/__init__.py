from .lm_eval import (
    perplexity,
    next_token_accuracy,
    evaluate_lm,
    lambada_style_accuracy,
    loglikelihood_from_ids,
    LMEvalAdapter,
)
from .tasks import (
    code_pass_at_k,
    exact_match_generation,
    rouge_l,
    summarization_rouge,
)

__all__ = ["perplexity", "next_token_accuracy", "evaluate_lm",
           "lambada_style_accuracy", "loglikelihood_from_ids",
           "LMEvalAdapter", "code_pass_at_k", "exact_match_generation",
           "rouge_l", "summarization_rouge"]
