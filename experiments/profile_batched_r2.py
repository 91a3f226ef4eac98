"""Profile batched decode (B=16, int4 fused, int8-KV, XLA attention).

PERF_NOTES records 509 tok/s at B=16 (~31.4 ms/step). The roofline says
~10 ms (weights 3.7 GB -> wall ~9 ms shared with B=1; int8 cache reads
16 slots x 256 MB = 4 GB -> ~5 ms at HBM). Trace a 32-step loop and
aggregate device time by op family to find the scaling term.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import decode_attention as da
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import fuse_for_serving
from decode_ab import build_decode

TRACE_DIR = "/tmp/decode_trace_b16"
BATCH = 16
STEPS = 32


def main():
    print("device:", jax.devices(), flush=True)
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128))
    fuse_for_serving(qmodel)
    print("built", flush=True)

    da.set_decode_attn_impl("xla")
    state, make_caches, decode = build_decode(qmodel, BATCH, 1024,
                                              quant_kv=True)
    tok = jnp.zeros((BATCH, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, STEPS)
    _ = np.asarray(acc)
    wall = time.time() - t0
    print(f"wall {wall/STEPS*1e3:.2f} ms/step "
          f"({BATCH*STEPS/wall:.1f} tok/s)", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    _, _, acc = decode(state, make_caches(), tok, STEPS)
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
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e6
            agg[name] += dur
            total += dur
    print(f"\ntotal device time {total*1e3:.1f} ms over {STEPS} steps "
          f"({total/STEPS*1e3:.2f} ms/step)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:35]
    for name, dur in rows:
        print(f"  {dur/STEPS*1e6:8.1f} us/step  {100*dur/total:5.1f}%  "
              f"{name[:100]}")


if __name__ == "__main__":
    main()
