"""End-to-end continuous-batching engine throughput on hardware.

llama2-7b W4A8 + quantized lm_head + int8 KV, 16 slots, chunked decode.
Mid-round-2 state of this measurement (8 slots, pre-retile kernels) was
222 tok/s steady state; the host loop pays ~36 ms tunnel RTT per
dispatch in this environment.
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
N_REQS = 48
PROMPT_LEN = 96
MAX_NEW = 128


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

    paged = "--paged" in sys.argv
    print(f"mode: {'paged' if paged else 'contiguous'}", flush=True)
    engine = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS,
                                      max_len=1024, paged=paged)
    rng = np.random.default_rng(0)
    for _ in range(N_REQS):
        engine.submit(rng.integers(0, 32000, (PROMPT_LEN,)),
                      max_new_tokens=MAX_NEW)
    t0 = time.time()
    done = engine.run()
    wall = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    print(f"{len(done)} requests, {toks} generated tokens in {wall:.1f}s "
          f"-> {toks/wall:.1f} tok/s end-to-end "
          f"({N_REQS*PROMPT_LEN/wall:.0f} prompt tok/s ingested alongside)",
          flush=True)
    m = engine.metrics()
    print("dispatch split:", {k: m[k] for k in
          ("combined_dispatches", "prefill_chunk_dispatches",
           "decode_dispatches")}, flush=True)
    # warm second wave: steady-state rate without compile time in wall
    for _ in range(N_REQS):
        engine.submit(rng.integers(0, 32000, (PROMPT_LEN,)),
                      max_new_tokens=MAX_NEW)
    t0 = time.time()
    done2 = engine.run()
    wall2 = time.time() - t0
    toks2 = sum(len(r.generated) for r in done2)
    print(f"warm wave: {toks2} tokens in {wall2:.1f}s -> "
          f"{toks2/wall2:.1f} tok/s end-to-end", flush=True)


if __name__ == "__main__":
    main()
