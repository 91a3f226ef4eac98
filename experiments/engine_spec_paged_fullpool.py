"""Round-5 batch 10: paged-spec WITHOUT preemption pressure.

Batch 8/9 ran paged speculation on the default half-sized pool (17
pages for 8 slots x ~312-token streams) — preemption storms re-prefilled
slots all wave and the block table re-uploaded every dispatch. With the
full pool + the dirty-flag block-table cache, how close does paged-spec
get to contiguous-spec (976-1096 tok/s warm)? Also the prefix-caching
serving win at 7B: 16 requests sharing a 384-token system prompt,
cached vs uncached paged engines (prefill skip = 3 pages/request).
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
FULL = N_SLOTS * 4 + 1          # max_len=512, page=128 -> pmax=4


def prompts(rng):
    out = []
    for _ in range(N_REQS):
        chunk = rng.integers(0, 32000, (48,))
        out.append(np.concatenate([chunk, chunk, chunk[:24]]))
    return out


def wave(engine, ps, label, mnt=MAX_NEW):
    for p in ps:
        engine.submit(p, max_new_tokens=mnt)
    t0 = time.time()
    done = engine.run(chunk=4)
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    print(f"  {label:24s}: {toks} tok in {wall:.1f}s -> "
          f"{toks/wall:.1f} tok/s", flush=True)
    return toks / wall, wall


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
    g, _ = wave(base, prompts(rng), "normal warm")
    del base

    spec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                    speculative="ngram", spec_k=8,
                                    spec_n=2)
    wave(spec, prompts(rng), "contig-spec cold")
    s0, _ = wave(spec, prompts(rng), "contig-spec warm")
    del spec

    pspec = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                     paged=True, page_size=128,
                                     n_pages=FULL, speculative="ngram",
                                     spec_k=8, spec_n=2)
    wave(pspec, prompts(rng), "paged-spec FULL cold")
    s1, _ = wave(pspec, prompts(rng), "paged-spec FULL warm")
    m = pspec.metrics()
    print(f"  paged-spec full pool: preemptions={m['preemptions']}, "
          f"{m['spec_accepted']/max(m['spec_rounds'],1):.2f} tok/round, "
          f"{s1/g:.2f}x normal, {s1/s0:.2f}x of contig-spec", flush=True)
    del pspec

    # ---- prefix caching at 7B: shared 384-token system prompt ----
    system = rng.integers(0, 32000, (384,))
    ps = [np.concatenate([system, rng.integers(0, 32000, (16,))])
          for _ in range(N_REQS)]
    for pc in (False, True):
        eng = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS,
                                       max_len=512, paged=True,
                                       page_size=128, n_pages=FULL,
                                       prefix_cache=pc)
        wave(eng, ps, f"prefix={pc} cold", mnt=16)
        _, w = wave(eng, ps, f"prefix={pc} warm", mnt=16)
        if pc:
            m = eng.metrics()
            print(f"  prefix cache: hit_tokens={m['prefix_hit_tokens']}, "
                  f"lookups={m['prefix_lookups']}", flush=True)
        del eng


if __name__ == "__main__":
    main()
