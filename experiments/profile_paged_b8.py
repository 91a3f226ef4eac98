"""Profile llama2-7b B=8 PAGED decode (round 4): paged runs 60 ms/step
vs 13 contiguous; the v2 attention kernel explains only ~8 ms of the
gap. Aggregate device time by op family to find the other ~40 ms.
"""
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
from paged_v2_ab import build_paged_decode

TRACE_DIR = "/tmp/paged_trace_r4"
STEPS = 32
BATCH = 8


def main():
    print("device:", jax.devices(), flush=True)
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print("built", flush=True)

    state, make, decode = build_paged_decode(qmodel, BATCH)
    tok = jnp.zeros((BATCH, 1), jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make(), tok, 4)
    _ = np.asarray(acc)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    _, _, acc = decode(state, make(), tok, STEPS)
    _ = np.asarray(acc)
    wall = time.time() - t0
    print(f"wall {wall/STEPS*1e3:.2f} ms/step", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    _, _, acc = decode(state, make(), tok, STEPS)
    _ = np.asarray(acc)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    paths = glob.glob(TRACE_DIR + "/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))
                and "XLA" not in str(e.get("args", {}).get("name", ""))}
    agg = defaultdict(float)
    fam = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e6
            if name.startswith(("jit_", "while")):
                continue
            agg[name] += dur
            fam[re.sub(r"[.\d]+$", "", name)] += dur
            total += dur
    print(f"\nleaf device time {total*1e3:.1f} ms over {STEPS} steps "
          f"({total/STEPS*1e3:.2f} ms/step)")
    print("\n-- by family --")
    for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {dur/STEPS*1e6:8.1f} us/step  {100*dur/total:5.1f}%  {name}")
    print("\n-- top single ops --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {dur/STEPS*1e6:8.1f} us/step  {100*dur/total:5.1f}%  "
              f"{name[:100]}")


if __name__ == "__main__":
    main()
