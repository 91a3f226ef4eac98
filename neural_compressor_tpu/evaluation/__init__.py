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
from .code_eval import ByteTokenizer, CodeEvaluator, CodeTask, builtin_tasks
from .summarization import (
    repo_summarization_pairs,
    rouge_scores,
    summarization_evaluate,
)

__all__ = ["perplexity", "next_token_accuracy", "evaluate_lm",
           "lambada_style_accuracy", "loglikelihood_from_ids",
           "LMEvalAdapter", "code_pass_at_k", "exact_match_generation",
           "rouge_l", "summarization_rouge", "ByteTokenizer",
           "CodeEvaluator", "CodeTask", "builtin_tasks", "rouge_scores",
           "summarization_evaluate", "repo_summarization_pairs"]
