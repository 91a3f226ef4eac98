"""Generation-based evaluation: code pass@k and summarization ROUGE.

The bigcode-eval / hf_eval counterparts (reference
neural_compressor/evaluation/{bigcode_eval,hf_eval}/) on the in-repo
trained model: quantize, generate candidates for the built-in code
tasks (execution-sandboxed pass@k), then beam-search summaries over the
offline lead-sentence corpus and score rouge1/2/L/Lsum.

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/generation_eval.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import neural_compressor_tpu as nq
from neural_compressor_tpu.evaluation import (ByteTokenizer, CodeEvaluator,
                                              builtin_tasks,
                                              repo_summarization_pairs,
                                              summarization_evaluate)
from neural_compressor_tpu.evaluation.train_tiny import load_tiny_lm
from neural_compressor_tpu.models.llama import LlamaForCausalLM


def main():
    model = load_tiny_lm()
    if model is None:
        print("(no trained checkpoint — using the random test preset; "
              "scores will be ~0)")
        model = LlamaForCausalLM.from_preset("llama-test")
    qmodel = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=32))
    tok = ByteTokenizer()

    # --- code eval: generate 4 samples/task for two tasks, execute,
    # report pass@1 / pass@4 (the byte LM is corpus-trained, not a code
    # model — the harness mechanics are the point; swap in your model +
    # CodeTask list for real numbers)
    ev = CodeEvaluator(qmodel, tok, max_new_tokens=48, max_len=256)
    res = ev.evaluate(builtin_tasks(), patterns="add_two,fib",
                      n_samples=4, k=(1, 4),
                      save_generations_path="/tmp/code_gens.json")
    print("code eval:", {k: round(v, 3) for k, v in res.items()
                         if isinstance(v, float)})

    # --- summarization: lead-sentence corpus from the repo's markdown
    sources, targets = repo_summarization_pairs(4)
    rouge = summarization_evaluate(qmodel, tok, sources, targets,
                                   num_beams=2, max_new_tokens=48)
    print("summarization rouge:", rouge)


if __name__ == "__main__":
    main()
