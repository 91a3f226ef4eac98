"""Accuracy-driven autotune: find the lightest config within a ppl budget.

Sweeps the config set (list-valued params expand into trials) against a
perplexity-based score, stopping at the first config within
``tolerable_loss`` of the fp baseline — the reference's §3.2 trial loop.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.common.tuning import TuningConfig
from neural_compressor_tpu.evaluation import evaluate_lm
from neural_compressor_tpu.models import LlamaForCausalLM


def main():
    # prefer the TRAINED in-repo model (real ppl landscape); fall back to
    # random init when the checkpoint is absent
    from neural_compressor_tpu.evaluation.train_tiny import (
        frozen_corpus, load_tiny_lm)

    model = load_tiny_lm()
    if model is not None:
        _train, val = frozen_corpus()
        data = val[:32]
    else:
        model = LlamaForCausalLM.from_preset("llama-test")
        data = np.random.default_rng(0).integers(0, 256, (16, 64))

    def eval_fn(m):
        return -evaluate_lm(m, data, batch_size=8)["ppl"]  # higher=better

    config_set = nq.RTNConfig(dtype=["int2", "int4", "int8"],
                              group_size=[32, 128])
    best = nq.autotune(
        model,
        TuningConfig(config_set=config_set, tolerable_loss=0.01,
                     max_trials=6),
        eval_fn=eval_fn)
    print("best model ppl:", evaluate_lm(best, data)["ppl"])


if __name__ == "__main__":
    main()
