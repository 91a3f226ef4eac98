"""Accuracy-parity benchmark: quantization ppl delta on the in-repo model.

Prints ONE JSON line (sibling of bench.py's throughput line):
  {"metric": "ppl_delta_int4_gptq", "value": <ppl_q - ppl_fp>,
   "unit": "ppl", "vs_baseline": <ppl_fp>}

plus a per-algorithm table on stderr. The reference's value claim is its
accuracy tables (docs/source/llm_recipes.md:42-260 — quantized/fp ratios
≈ 1.0); this is the offline TPU-build analog: a real (trained, non-random)
byte-level LM, held-out split, Δppl per algorithm at int8/int4.

Run ``python -m neural_compressor_tpu.evaluation.train_tiny`` first to
(re)train the checkpoint; without one this script trains it (~minutes on
the TPU chip, longer on CPU).
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import calibration_forward
from neural_compressor_tpu.evaluation.lm_eval import perplexity
from neural_compressor_tpu.evaluation.train_tiny import (
    SEQ_LEN, frozen_corpus, load_tiny_lm, train_tiny_lm)


FAMILY = "tiny_lm"  # set by --family (tiny_lm | tiny_gqa | tiny_moe | tiny_mla)


def fresh_model():
    from neural_compressor_tpu.evaluation.train_tiny import load_tiny_model

    m = load_tiny_lm() if FAMILY == "tiny_lm" else load_tiny_model(FAMILY)
    assert m is not None
    return m


def main():
    if FAMILY == "tiny_lm":
        model = load_tiny_lm()
        if model is None:
            print("no checkpoint found - training", file=sys.stderr)
            model, _ = train_tiny_lm()
    else:
        from neural_compressor_tpu.evaluation.train_tiny import (
            load_tiny_model, train_tiny_model)

        model = load_tiny_model(FAMILY)
        if model is None:
            print(f"no {FAMILY} checkpoint - training", file=sys.stderr)
            model, _ = train_tiny_model(FAMILY, steps=1200, batch_size=16)

    train, val = frozen_corpus()
    val = val[:96]
    calib = [jnp.asarray(train[i * 8:(i + 1) * 8]) for i in range(4)]
    run_fn = lambda mm: calibration_forward(mm, calib)  # noqa: E731

    ppl_fp = perplexity(model, val, batch_size=16)

    algos = {
        "rtn_int8": (nq.RTNConfig(dtype="int8", bits=8, group_size=128),
                     None),
        "rtn_int4": (nq.RTNConfig(dtype="int4", group_size=128), None),
        "gptq_int4": (nq.GPTQConfig(dtype="int4", group_size=128,
                                    block_size=128), run_fn),
        "awq_int4": (nq.AWQConfig(dtype="int4", group_size=128), run_fn),
        "hqq_int4": (nq.HQQConfig(dtype="int4", group_size=128), None),
        "teq_int4": (nq.TEQConfig(dtype="int4", group_size=128,
                                  train_steps=60), run_fn),
        "autoround_int4": (nq.AutoRoundConfig(dtype="int4", group_size=128,
                                              iters=60), run_fn),
        "sq_w8a8": (nq.SmoothQuantConfig(), run_fn),
        "fp8_e4m3": (nq.FP8Config(dump_stats_path=None), run_fn),
        "mxfp8_w": (nq.MXQuantConfig(w_dtype="mxfp8_e4m3",
                                     weight_only=True), None),
        "nvfp4_w": (nq.MXQuantConfig(w_dtype="nvfp4", blocksize=16,
                                     weight_only=True), None),
        # QuaRot rotation (computed FWHT) then the W4A8 hybrid-GPTQ flow
        "quarot_w4a8": (nq.HybridGPTQConfig(dtype="int4", group_size=128,
                                            block_size=128), run_fn),
    }
    results = {}
    for name, (cfg, rf) in algos.items():
        try:
            m = fresh_model()
            if name == "quarot_w4a8":
                from neural_compressor_tpu.algorithms.quarot import \
                    apply_quarot

                apply_quarot(m, seed=0)
            qm = nq.quantize(m, cfg, run_fn=rf)
            results[name] = perplexity(qm, val, batch_size=16)
        except Exception as e:  # pragma: no cover
            print(f"  {name} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            results[name] = float("nan")

    # KV-cache quantization: measured through the DECODE path (the cache
    # formats only exist there); fp-weights model, quantized cache —
    # isolates the KV cost from weight quantization
    from neural_compressor_tpu.evaluation.lm_eval import decode_perplexity

    kv_val = val[:32]
    ppl_decode_fp = decode_perplexity(model, kv_val, batch_size=16)
    for fmt in ("int8", "fp8_e4m3", "int4"):
        try:
            p = decode_perplexity(model, kv_val, batch_size=16,
                                  kv_quantized=fmt)
            results[f"kv_{fmt}"] = ppl_fp + (p - ppl_decode_fp)
        except Exception as e:  # pragma: no cover
            print(f"  kv_{fmt} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            results[f"kv_{fmt}"] = float("nan")

    print(f"fp ppl: {ppl_fp:.4f}", file=sys.stderr)
    for name, p in results.items():
        print(f"  {name:10s} ppl {p:8.4f}  delta {p - ppl_fp:+.4f}  "
              f"ratio {ppl_fp / p if p else 0:.4f}", file=sys.stderr)

    delta = results["gptq_int4"] - ppl_fp
    print(json.dumps({
        "metric": f"ppl_delta_int4_gptq"
                  + ("" if FAMILY == "tiny_lm" else f"_{FAMILY}"),
        "value": round(float(delta), 4),
        "unit": "ppl",
        "vs_baseline": round(float(ppl_fp), 4),
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="tiny_lm",
                    choices=("tiny_lm", "tiny_gqa", "tiny_moe", "tiny_mla"))
    args = ap.parse_args()
    FAMILY = args.family
    main()
