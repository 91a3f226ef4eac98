"""Round-5: speculative serving over INT4 pools at 7B (chip check).

The windowed nibble-patch write kernel + int4 W-query paged attention
(kernels/paged_attention.py round 5) must compile under Mosaic and hold
the acceptance rate. Same repetitive workload as
engine_spec_throughput.py: llama2-7b W4A8 + int4-KV model, 8 slots —
normal vs spec k=8 on the contiguous int4 cache, then spec k=8 on the
PAGED int4 pool (half the int8 pool bytes, 8x bf16 token capacity).
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


def wave(engine, ps, label):
    for p in ps:
        engine.submit(p, max_new_tokens=MAX_NEW)
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
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True)
        + nq.KVCacheQuantConfig(dtype="int4"))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)

    base = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512)
    wave(base, prompts(rng), "normal int4 cold")
    g = wave(base, prompts(rng), "normal int4 warm")
    del base

    spec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                    speculative="ngram", spec_k=8,
                                    spec_n=2)
    wave(spec, prompts(rng), "spec int4 cold")
    s = wave(spec, prompts(rng), "spec int4 warm")
    m = spec.metrics()
    print(f"  spec int4 contiguous: "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tokens/round,"
          f" speedup {s/g:.2f}x", flush=True)
    del spec

    pspec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                     paged=True, page_size=128,
                                     speculative="ngram", spec_k=8,
                                     spec_n=2)
    wave(pspec, prompts(rng), "paged-spec int4 cold")
    s2 = wave(pspec, prompts(rng), "paged-spec int4 warm")
    m = pspec.metrics()
    print(f"  paged-spec int4: "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tokens/round,"
          f" speedup {s2/g:.2f}x vs normal-contiguous", flush=True)


if __name__ == "__main__":
    main()
