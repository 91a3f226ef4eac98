"""Round-5: speculative (prompt-lookup) SERVING throughput at 7B.

llama2-7b W4A8 + q-lm_head, 8 slots, contiguous caches. Repetitive
workload (each prompt = a repeated passage, the summarization/code-edit
copy regime): normal engine vs speculative="ngram" engine, warm waves.
B=1 PLD measured 3.2x; the serving question is how much survives
batching (the verify window multiplies MXU work per emitted token while
the weight stream amortizes over slots).
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
        out.append(np.concatenate([chunk, chunk, chunk[:24]]))  # 120 toks
    return out


def wave(engine, ps, label):
    for p in ps:
        engine.submit(p, max_new_tokens=MAX_NEW)
    t0 = time.time()
    done = engine.run(chunk=4)
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    print(f"  {label:12s}: {toks} tok in {wall:.1f}s -> "
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

    base = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512)
    wave(base, prompts(rng), "normal cold")
    g = wave(base, prompts(rng), "normal warm")

    for k in (4, 8):
        spec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS,
                                        max_len=512, speculative="ngram",
                                        spec_k=k, spec_n=2)
        wave(spec, prompts(rng), f"spec k={k} cold")
        s = wave(spec, prompts(rng), f"spec k={k} warm")
        m = spec.metrics()
        tpr = m["spec_accepted"] / max(m["spec_rounds"], 1)
        print(f"  spec k={k}: {tpr:.2f} tokens/round, "
              f"speedup {s/g:.2f}x", flush=True)

    # round-5 later: speculative over PAGED pools (windowed page writes
    # + W-query paged attention) — memory elasticity AND speculation
    for k in (8,):
        spec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS,
                                        max_len=512, paged=True,
                                        page_size=128,
                                        speculative="ngram",
                                        spec_k=k, spec_n=2)
        wave(spec, prompts(rng), f"paged-spec k={k} cold")
        s = wave(spec, prompts(rng), f"paged-spec k={k} warm")
        m = spec.metrics()
        tpr = m["spec_accepted"] / max(m["spec_rounds"], 1)
        print(f"  paged-spec k={k}: {tpr:.2f} tokens/round, "
              f"speedup {s/g:.2f}x vs normal-contiguous", flush=True)


if __name__ == "__main__":
    main()
