"""Speculative decoding on the in-repo trained LM.

Self-speculation via quantization: the target is the trained fp model,
the draft its int4 RTN quantization. Because int4 barely moves the
argmax distribution (Δppl +0.037, PERF_NOTES.md), the draft's proposals
are accepted most of the time — and the output is EXACTLY the target's
greedy continuation by construction. On a 7B-class target the draft
would instead be a small sibling model; acceptance length then converts
directly into decode latency: a verify over k+1 positions streams the
weights once, same as a single decode step (weight-bound regime).

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/speculative_decoding.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.evaluation.train_tiny import (frozen_corpus,
                                                         load_tiny_lm,
                                                         train_tiny_lm)
from neural_compressor_tpu.generation import (greedy_search,
                                              speculative_greedy_search)


def main():
    target = load_tiny_lm()
    if target is None:
        print("training the tiny LM first (one-time)...")
        target, _ = train_tiny_lm(steps=1200, batch_size=16)
    draft = nq.quantize(load_tiny_lm(),
                        nq.RTNConfig(dtype="int4", group_size=32))

    _train, val = frozen_corpus()
    prompt = jnp.asarray(val[:2, :32])
    k, mnt = 4, 48

    ref = greedy_search(target, prompt, max_new_tokens=mnt)
    out, stats = speculative_greedy_search(target, draft, prompt,
                                           max_new_tokens=mnt, k=k,
                                           return_stats=True)
    assert bool(jnp.all(out == ref)), "speculative must match greedy exactly"
    print(f"output identical to greedy over {mnt} tokens x 2 rows")
    print(f"rounds: {stats['rounds']} (ceiling {mnt}), "
          f"tokens/round: {stats['tokens_per_round']:.2f} of max {k + 1}")
    print(f"-> target forwards cut {mnt / max(stats['rounds'], 1):.1f}x; "
          "on a weight-bound 7B target that is the decode speedup "
          "(minus the draft's cost)")
    txt = bytes(np.asarray(out[0, 32:]).astype(np.uint8)).decode(
        "latin-1")
    print("continuation:", repr(txt[:60]))


if __name__ == "__main__":
    main()
