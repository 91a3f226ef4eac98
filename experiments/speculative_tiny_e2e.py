"""Round-4: speculative decoding END-TO-END speedup on a trained pair.

The 7B run (speculative_tpu.py) showed the mechanism at worst-case
acceptance (random weights -> drafts disagree). This measures the other
side: the trained tiny_lm target with the trained 2-layer half-width
draft (tiny_draft, ~1/8 FLOPs, same frozen corpus), all on the chip —
greedy baseline vs speculative at k in {2, 4, 8}, histograms, exactness,
and the draft/target cost ratio.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.evaluation.train_tiny import (frozen_corpus,
                                                         load_tiny_lm,
                                                         load_tiny_model)
from neural_compressor_tpu.generation import (greedy_search,
                                              speculative_greedy_search)

MNT = 256


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    ret = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(ret)  # compile + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
        ret = out[0] if isinstance(out, tuple) else out
        _ = np.asarray(ret)
    return (time.time() - t0) / reps, out


def main():
    print("device:", jax.devices(), flush=True)
    target = load_tiny_lm()
    draft = load_tiny_model("tiny_draft")
    assert target is not None and draft is not None
    _train, val = frozen_corpus()
    prompt = jnp.asarray(val[:1, :64])

    dt_g, ref = timed(greedy_search, target, prompt, max_new_tokens=MNT)
    base = MNT / dt_g
    print(f"greedy target: {dt_g/MNT*1e3:.3f} ms/tok  {base:.1f} tok/s",
          flush=True)
    dt_d, _ = timed(greedy_search, draft, prompt, max_new_tokens=MNT)
    print(f"greedy draft:  {dt_d/MNT*1e3:.3f} ms/tok "
          f"(cost ratio {dt_d/dt_g:.2f})", flush=True)

    for k in (2, 4, 8):
        dt, (out, stats) = timed(
            speculative_greedy_search, target, draft, prompt,
            max_new_tokens=MNT, k=k, return_stats=True)
        ok = bool(jnp.all(out == ref))
        tps = MNT / dt
        print(f"spec k={k}: {tps:7.1f} tok/s ({tps/base:.2f}x)  "
              f"rounds={stats['rounds']} "
              f"tok/round={stats['tokens_per_round']:.2f} "
              f"hist={stats['accept_hist']} exact={ok}", flush=True)


if __name__ == "__main__":
    main()
