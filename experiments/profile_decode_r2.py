"""Profile the current headline decode step (W4A8 + quantized lm_head).

Captures a jax.profiler trace of the 256-step fori_loop decode and
aggregates TPU op time by kernel family to find what is left between
10.8 ms/step and the ~9 ms matmul floor.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized,
                                                init_kv_cache)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
import bench

TRACE_DIR = "/tmp/decode_trace_r2"


def main():
    print("device:", jax.devices(), flush=True)
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print("built", flush=True)

    caches = init_kv_cache(qmodel.cfg, 1, 1024)
    state, decode = bench.build_decode_fn(qmodel, 1, 1024)
    tok = jnp.zeros((1, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, caches, tok, 0, 4)
    _ = np.asarray(acc)
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    _, _, acc = decode(state, caches, tok, 0, 64)
    _ = np.asarray(acc)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    # aggregate: find the trace json
    paths = glob.glob(TRACE_DIR + "/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find TPU pids (device compute lanes)
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))
                and "XLA" not in str(e.get("args", {}).get("name", ""))}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e6  # us -> s
            agg[name] += dur
            total += dur
    print(f"\ntotal device time {total*1e3:.1f} ms over 64 steps "
          f"({total/64*1e3:.2f} ms/step)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    for name, dur in rows:
        print(f"  {dur/64*1e6:8.1f} us/step  {100*dur/total:5.1f}%  "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
