"""Round-5: SAMPLED speculative serving throughput at 7B (chip check).

Rejection-sampling verification adds a [B*W, V] sort + softmax per
round on top of the greedy verifier. Same repetitive workload as
engine_spec_paged_fullpool.py: greedy-spec vs sampled-spec (temp 0.8,
top-k 40) vs sampled non-spec, 8 slots, contiguous caches, full waves.
Acceptance under sampling is lower than greedy's 5.3 tok/round (a
proposal must beat a coin flip at p(t), not just equal the argmax) —
the question is the net speedup that survives.
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

N_SLOTS = 8
N_REQS = 16
MAX_NEW = 192


def prompts(rng):
    out = []
    for _ in range(N_REQS):
        chunk = rng.integers(0, 32000, (48,))
        out.append(np.concatenate([chunk, chunk, chunk[:24]]))
    return out


def wave(engine, ps, label, **skw):
    for i, p in enumerate(ps):
        engine.submit(p, max_new_tokens=MAX_NEW,
                      **({**skw, "seed": i} if skw else {}))
    t0 = time.time()
    done = engine.run(chunk=4)
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    print(f"  {label:22s}: {toks} tok in {wall:.1f}s -> "
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
    skw = dict(do_sample=True, temperature=0.8, top_k=40)

    base = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512)
    wave(base, prompts(rng), "sampled normal cold", **skw)
    g = wave(base, prompts(rng), "sampled normal warm", **skw)
    del base

    spec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                    speculative="ngram", spec_k=8,
                                    spec_n=2)
    wave(spec, prompts(rng), "greedy-spec cold")
    gs = wave(spec, prompts(rng), "greedy-spec warm")
    m = spec.metrics()
    print(f"  greedy-spec: "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tok/round",
          flush=True)
    del spec

    sspec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                     speculative="ngram", spec_k=8,
                                     spec_n=2)
    wave(sspec, prompts(rng), "sampled-spec cold", **skw)
    s = wave(sspec, prompts(rng), "sampled-spec warm", **skw)
    m = sspec.metrics()
    print(f"  sampled-spec: "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tok/round, "
          f"{s/g:.2f}x vs sampled normal", flush=True)


if __name__ == "__main__":
    main()
