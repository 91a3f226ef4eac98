"""Profile llama3-8b B=1 fused decode (north-star model, round 3).

Current: 171.5 tok/s (5.83 ms/step). Roofline: weights 8B int4 g128
(~4.2 GB incl. 263 MB quantized lm_head) at the measured 954 GB/s stream
ceiling + GQA KV ~0.13 GB/step => ~4.6 ms => ~217 tok/s. Where do the
extra ~1.2 ms live? Aggregate by op-name family."""
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized,
                                                init_kv_cache)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     to_w4a8_serving,
                                                     s4_prepare)
from flax import nnx
import functools

TRACE_DIR = "/tmp/decode_trace_llama3_r3"
STEPS = 128


def main():
    print("device:", jax.devices(), flush=True)
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama3-8b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    nf = fuse_for_serving(qmodel)
    nw = to_w4a8_serving(qmodel)
    nfd = enable_fused_decode(qmodel)
    print(f"built ({nf} fused, {nw} w4a8, {nfd} fused-decode)", flush=True)

    graphdef, state = nnx.split(qmodel)

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
    def decode(state, caches, token, steps):
        m = nnx.merge(graphdef, state)
        s4_prepare(m)

        def body(i, carry):
            token, caches, acc = carry
            positions = jnp.full((1, 1), i, dtype=jnp.int32)
            logits, caches = m(token, positions=positions, caches=caches,
                               cache_pos=i)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(token.dtype)
            return nxt, caches, acc + logits[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, steps, body,
                                 (token, caches, jnp.float32(0)))

    tok = jnp.zeros((1, 1), dtype=jnp.int32)
    cfg = qmodel.cfg
    t0 = time.time()
    _, _, acc = decode(state, init_kv_cache(cfg, 1, 1024), tok, 4)
    _ = np.asarray(acc)
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    _, _, acc = decode(state, init_kv_cache(cfg, 1, 1024), tok, STEPS)
    _ = np.asarray(acc)
    wall = time.time() - t0
    print(f"wall {wall/STEPS*1e3:.2f} ms/step ({STEPS/wall:.1f} tok/s)",
          flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    _, _, acc = decode(state, init_kv_cache(cfg, 1, 1024), tok, STEPS)
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
                continue  # container events double-count their children
            agg[name] += dur
            fam[re.sub(r"[.\d]+$", "", name)] += dur
            total += dur
    print(f"\nleaf device time {total*1e3:.1f} ms over {STEPS} steps "
          f"({total/STEPS*1e3:.2f} ms/step)")
    print("\n-- by family --")
    for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur/STEPS*1e6:8.1f} us/step  {100*dur/total:5.1f}%  {name}")
    print("\n-- top single ops --")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur/STEPS*1e6:8.1f} us/step  {100*dur/total:5.1f}%  "
              f"{name[:100]}")


if __name__ == "__main__":
    main()
