"""Quantization accuracy-parity evaluation on the in-repo trained LM.

Loads the committed checkpoint (artifacts/tiny_lm, trained on the repo's
own text corpus) and reports held-out perplexity deltas for each
quantization algorithm — the offline analog of the reference's recipe
accuracy tables (docs/source/llm_recipes.md).

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/accuracy_eval.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax.numpy as jnp

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import calibration_forward
from neural_compressor_tpu.evaluation import perplexity
from neural_compressor_tpu.evaluation.train_tiny import (
    SEQ_LEN, frozen_corpus, load_tiny_lm, train_tiny_lm)


def main():
    model = load_tiny_lm()
    if model is None:
        print("training the tiny LM first (one-time)...")
        model, _ = train_tiny_lm(steps=1200, batch_size=16)

    train, val = frozen_corpus()
    val = val[:48]
    calib = [jnp.asarray(train[i * 8:(i + 1) * 8]) for i in range(2)]
    run_fn = lambda m: calibration_forward(m, calib)  # noqa: E731

    ppl_fp = perplexity(model, val, batch_size=16)
    print(f"fp32 ppl: {ppl_fp:.4f}")
    for name, cfg, rf in [
        ("RTN int8", nq.RTNConfig(dtype="int8", bits=8, group_size=128),
         None),
        ("GPTQ int4", nq.GPTQConfig(dtype="int4", group_size=64,
                                    block_size=64), run_fn),
        ("SmoothQuant W8A8", nq.SmoothQuantConfig(), run_fn),
    ]:
        qm = nq.quantize(load_tiny_lm(), cfg, run_fn=rf)
        ppl = perplexity(qm, val, batch_size=16)
        print(f"{name:18s} ppl {ppl:.4f}  delta {ppl - ppl_fp:+.4f}")


if __name__ == "__main__":
    main()
