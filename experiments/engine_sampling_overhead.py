"""Engine per-request sampling overhead at 7B (round-5 VERDICT #1 "done"
bar: sampled serving within 5% of the greedy path).

llama2-7b W4A8 + q-lm_head + int8 KV, 16 slots, paged pools (the round-4
fastest serving mode). Three warm waves: greedy, sampled
(temperature/top-k/top-p per request), mixed. The sampled decode program
adds two [B, V] sorts + a categorical per step on V=32000 — the A/B says
what that costs end-to-end.
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
PROMPT_LEN = 96
MAX_NEW = 128


def wave(engine, rng, kw, label):
    for i in range(N_REQS):
        engine.submit(rng.integers(0, 32000, (PROMPT_LEN,)),
                      max_new_tokens=MAX_NEW,
                      **({**kw, "seed": i} if kw else {}))
    t0 = time.time()
    done = engine.run()
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    rate = toks / wall
    print(f"  {label:8s}: {toks} tok in {wall:.1f}s -> {rate:.1f} tok/s",
          flush=True)
    return rate


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True)
        + nq.KVCacheQuantConfig())
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    engine = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS,
                                      max_len=1024, paged=True)
    rng = np.random.default_rng(0)
    samp = dict(do_sample=True, temperature=0.8, top_k=50, top_p=0.95)
    wave(engine, rng, {}, "compile")          # cold (compiles)
    g = wave(engine, rng, {}, "greedy")
    wave(engine, rng, samp, "compile")        # sampled-program compiles
    s = wave(engine, rng, samp, "sampled")
    # mixed: half greedy half sampled (program = sampling variant)
    for i in range(N_REQS):
        engine.submit(rng.integers(0, 32000, (PROMPT_LEN,)),
                      max_new_tokens=MAX_NEW,
                      **(dict(**samp, seed=i) if i % 2 else {}))
    t0 = time.time()
    done = engine.run()
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    print(f"  mixed   : {toks} tok in {wall:.1f}s -> {toks/wall:.1f} tok/s",
          flush=True)
    print(f"sampling overhead: {100 * (1 - s / g):.1f}% "
          f"(greedy {g:.1f} vs sampled {s:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
