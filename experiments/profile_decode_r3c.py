"""Profile the round-3 starting point: llama2-7b B=1 headline decode
(s4_rowpack W4A8 + quantized lm_head + bf16 KV + fused decode attention).

Round-2 exit: 6.73 ms/step (148.6 tok/s). Goal: an op-level breakdown of
where the non-matmul ~1.65 ms lives before building the fusion kernels.
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
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode

TRACE_DIR = "/tmp/decode_trace_b1_r3c"
STEPS = 128


def main():
    print("device:", jax.devices(), flush=True)
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    nf = fuse_for_serving(qmodel)
    nw = to_w4a8_serving(qmodel)
    nfd = enable_fused_decode(qmodel)
    print(f"built ({nf} fused, {nw} w4a8, {nfd} fused-decode)", flush=True)

    state, make_caches, decode = build_decode(qmodel, 1, 1024)
    tok = jnp.zeros((1, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, STEPS)
    _ = np.asarray(acc)
    wall = time.time() - t0
    print(f"wall {wall/STEPS*1e3:.2f} ms/step "
          f"({STEPS/wall:.1f} tok/s)", flush=True)

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
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
    for name, dur in rows:
        print(f"  {dur/STEPS*1e6:8.1f} us/step  {100*dur/total:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
