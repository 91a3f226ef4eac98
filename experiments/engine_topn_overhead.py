"""Round-5: per-token top-N logprobs overhead at 7B.

Greedy serving, 16 slots: the engine built with logprobs_topk=5 adds a
[B, V] log_softmax + top_k per decode step and a [B, k, 5] x2 readback
per dispatch. Paired waves vs the plain engine (same workload/order as
engine_sampling_overhead.py) — the bar is the same <5%.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
from neural_compressor_tpu.serving import ContinuousBatchingEngine

N_SLOTS = 16
N_REQS = 32
MAX_NEW = 128


def wave(engine, ps, label, **kw):
    for p in ps:
        engine.submit(p, max_new_tokens=MAX_NEW, **kw)
    t0 = time.time()
    done = engine.run(chunk=8)
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    print(f"  {label:18s}: {toks} tok in {wall:.1f}s -> "
          f"{toks/wall:.1f} tok/s", flush=True)
    return toks / wall


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)
    ps = [rng.integers(0, 32000, (64,)) for _ in range(N_REQS)]

    plain = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=256)
    wave(plain, ps, "plain cold")
    rates_p = [wave(plain, ps, f"plain warm {i}") for i in range(3)]
    del plain
    topn = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=256,
                                    logprobs_topk=5)
    wave(topn, ps, "topn cold", top_logprobs=5)
    rates_t = [wave(topn, ps, f"topn warm {i}", top_logprobs=5)
               for i in range(3)]
    p, t = max(rates_p), max(rates_t)
    print(f"  top-5 logprobs overhead: {100 * (1 - t / p):.1f}% "
          f"({t:.1f} vs {p:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
