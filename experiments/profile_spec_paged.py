"""Round-5: profile the speculative serving step, contiguous vs PAGED.

Batch-8 measured paged-spec at 631 tok/s warm vs contiguous-spec 1096
(identical 5.30 tokens/round), i.e. ~28 ms/round of extra device or
dispatch time. Candidate costs: (a) the windowed page-write kernel
stages 2 full page blocks per slot per layer (vs contiguous
dynamic_update_slice fused into the program), (b) the W-query paged
attention re-reads whole pages, (c) extra per-round dispatches in the
paged spec driver. Trace both engines over a warm wave and aggregate
device time per ROUND by op family.
"""
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict

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
MAX_NEW = 128


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
    print(f"  {label:18s}: {toks} tok in {wall:.1f}s -> "
          f"{toks/wall:.1f} tok/s", flush=True)
    return toks


def profile(engine, tag, rng):
    wave(engine, prompts(rng), f"{tag} cold")
    wave(engine, prompts(rng), f"{tag} warm")
    r0 = engine.metrics()["spec_rounds"]
    tdir = f"/tmp/spec_trace_{tag}"
    jax.profiler.start_trace(tdir)
    wave(engine, prompts(rng), f"{tag} traced")
    jax.profiler.stop_trace()
    rounds = engine.metrics()["spec_rounds"] - r0
    print(f"  {tag}: {rounds} spec rounds traced", flush=True)

    paths = glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))
                and "XLA" not in str(e.get("args", {}).get("name", ""))}
    fam = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e6
            if name.startswith(("jit_", "while")):
                continue
            fam[re.sub(r"[.\d]+$", "", name)] += dur
            total += dur
    print(f"\n== {tag}: leaf device {total*1e3:.1f} ms / {rounds} rounds"
          f" = {total/max(rounds,1)*1e3:.2f} ms/round ==")
    for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {dur/max(rounds,1)*1e6:9.1f} us/round "
              f"{100*dur/total:5.1f}%  {name}", flush=True)
    return total / max(rounds, 1)


def main():
    preset = "llama3-8b" if "--llama3" in sys.argv else "llama2-7b"
    print("device:", jax.devices(), "preset:", preset, flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS[preset]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)

    cont = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                    speculative="ngram", spec_k=8,
                                    spec_n=2)
    a = profile(cont, "contig", rng)
    del cont
    paged = ContinuousBatchingEngine(qmodel, n_slots=N_SLOTS, max_len=512,
                                     paged=True, page_size=128,
                                     n_pages=N_SLOTS * 4 + 1,
                                     speculative="ngram", spec_k=8,
                                     spec_n=2)
    b = profile(paged, "paged", rng)
    print(f"\ndevice ms/round: contig {a*1e3:.2f} vs paged {b*1e3:.2f} "
          f"(delta {(b-a)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
