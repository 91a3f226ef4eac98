"""Round-5: rounds-per-dispatch sweep for paged speculation.

With device time ~2.3 ms/round and tunnel RTT ~30 ms, the dispatch
chunk (spec verify rounds per host round trip) sets the RTT
amortization: sweep run(chunk=...) at llama2-7b paged-spec full pool.
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

    eng = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                   paged=True, page_size=128,
                                   n_pages=N_SLOTS * 4 + 1,
                                   speculative="ngram", spec_k=8,
                                   spec_n=2)
    for ch in (4, 8, 16, 2):
        for phase in ("cold", "warm"):
            for p in prompts(rng):
                eng.submit(p, max_new_tokens=MAX_NEW)
            t0 = time.time()
            done = eng.run(chunk=ch)
            wall = time.time() - t0
            toks = sum(len(r.generated) for r in done)
            print(f"  chunk={ch:2d} {phase}: {toks} tok in {wall:.1f}s"
                  f" -> {toks/wall:.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
