from .lm_eval import (
    perplexity,
    next_token_accuracy,
    evaluate_lm,
    lambada_style_accuracy,
    loglikelihood_from_ids,
    LMEvalAdapter,
)

__all__ = ["perplexity", "next_token_accuracy", "evaluate_lm",
           "lambada_style_accuracy", "loglikelihood_from_ids",
           "LMEvalAdapter"]
