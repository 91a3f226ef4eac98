"""Round-5: speculative + prefix-cached serving on llama3-8b (GQA).

GQA packs (window, rep=4) query rows in the windowed paged kernel — 36
rows at k=8 — so llama3 is the shape that stresses the packing. Also
the combined production shape: prefix caching AND speculation in one
paged engine (shared system prompt + repetitive bodies).
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
FULL = N_SLOTS * 4 + 1


def prompts(rng):
    out = []
    for _ in range(N_REQS):
        chunk = rng.integers(0, 128000, (48,))
        out.append(np.concatenate([chunk, chunk, chunk[:24]]))
    return out


def wave(engine, ps, label, mnt=MAX_NEW):
    for p in ps:
        engine.submit(p, max_new_tokens=mnt)
    t0 = time.time()
    done = engine.run(chunk=4)
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    print(f"  {label:26s}: {toks} tok in {wall:.1f}s -> "
          f"{toks/wall:.1f} tok/s", flush=True)
    return toks / wall


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama3-8b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)

    base = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512)
    wave(base, prompts(rng), "normal cold")
    g = wave(base, prompts(rng), "normal warm")
    del base

    spec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                    speculative="ngram", spec_k=8,
                                    spec_n=2)
    wave(spec, prompts(rng), "contig-spec cold")
    s = wave(spec, prompts(rng), "contig-spec warm")
    m = spec.metrics()
    print(f"  llama3 contig-spec: "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tok/round, "
          f"{s/g:.2f}x", flush=True)
    del spec

    pspec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                     paged=True, page_size=128,
                                     n_pages=FULL, speculative="ngram",
                                     spec_k=8, spec_n=2)
    wave(pspec, prompts(rng), "paged-spec cold")
    s2 = wave(pspec, prompts(rng), "paged-spec warm")
    m = pspec.metrics()
    print(f"  llama3 paged-spec: "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tok/round, "
          f"{s2/g:.2f}x normal / {s2/s:.2f}x of contig-spec", flush=True)
    del pspec

    # production shape: shared system prompt + repetitive bodies, prefix
    # caching AND speculation in one paged engine
    system = rng.integers(0, 128000, (256,))
    ps = []
    for _ in range(N_REQS):
        chunk = rng.integers(0, 128000, (40,))
        ps.append(np.concatenate([system, chunk, chunk]))
    both = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                    paged=True, page_size=128,
                                    n_pages=FULL, speculative="ngram",
                                    spec_k=8, spec_n=2,
                                    prefix_cache=True)
    wave(both, ps, "prefix+spec cold", mnt=128)
    s3 = wave(both, ps, "prefix+spec warm", mnt=128)
    m = both.metrics()
    print(f"  prefix+spec: hit_tokens={m['prefix_hit_tokens']}, "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tok/round",
          flush=True)
    ref = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                   paged=True, page_size=128,
                                   n_pages=FULL)
    wave(ref, ps, "plain paged cold", mnt=128)
    s4 = wave(ref, ps, "plain paged warm", mnt=128)
    print(f"  prefix+spec vs plain paged: {s3/s4:.2f}x", flush=True)


if __name__ == "__main__":
    main()
