import glob, gzip, json, re, sys, time, functools
from collections import defaultdict
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from flax import nnx
import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized, init_kv_cache)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
    fuse_for_serving, to_w4a8_serving, s4_prepare)
from neural_compressor_tpu.kernels.decode_attention import set_ro_cache_space
from neural_compressor_tpu.kernels import fused_matvec as fm

set_ro_cache_space("pin")
fm.set_pin_operands(True)
TRACE = "/tmp/trace_pin_all"
STEPS = 128
qmodel = build_quantized(LlamaConfig(**LLAMA_PRESETS["llama3-8b"]),
                         nq.RTNConfig(dtype="int4", group_size=128,
                                      quant_lm_head=True))
fuse_for_serving(qmodel); to_w4a8_serving(qmodel); enable_fused_decode(qmodel)
graphdef, state = nnx.split(qmodel)
cfg = qmodel.cfg

@functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
def decode(state, caches, token, steps):
    m = nnx.merge(graphdef, state)
    s4_prepare(m)
    def body(i, carry):
        token, caches, acc = carry
        logits, caches = m(token, positions=jnp.full((1,1), i, jnp.int32),
                           caches=caches, cache_pos=i)
        nxt = jnp.argmax(logits[:, -1:], -1).astype(token.dtype)
        return nxt, caches, acc + logits[0,0,0].astype(jnp.float32)
    return jax.lax.fori_loop(0, steps, body, (token, caches, jnp.float32(0)))

tok = jnp.zeros((1,1), jnp.int32)
_,_,acc = decode(state, init_kv_cache(cfg,1,1024), tok, 4); _ = np.asarray(acc)
t0 = time.time()
_,_,acc = decode(state, init_kv_cache(cfg,1,1024), tok, STEPS); _ = np.asarray(acc)
print(f"wall {(time.time()-t0)/STEPS*1e3:.2f} ms/step", flush=True)
jax.profiler.start_trace(TRACE)
_,_,acc = decode(state, init_kv_cache(cfg,1,1024), tok, STEPS); _ = np.asarray(acc)
jax.profiler.stop_trace()
paths = glob.glob(TRACE + "/plugins/profile/*/*.trace.json.gz")
with gzip.open(sorted(paths)[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = str(e.get("args", {}).get("name", ""))
tpu_pids = {p for p, n in names.items() if "TPU" in n and "XLA" not in n}
fam = defaultdict(float); total = 0.0
shapes = defaultdict(lambda: [0.0, 0])
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        name = e.get("name", "?")
        if name.startswith(("jit_", "while")): continue
        dur = e.get("dur", 0)/1e6
        fam[re.sub(r"[.\d]+$", "", name)] += dur
        total += dur
        if name.startswith("copy-done"):
            sh = e.get("args", {}).get("shape_with_layout", "?")
            shapes[sh][0] += dur; shapes[sh][1] += 1
print(f"leaf {total/STEPS*1e3:.2f} ms/step")
for name, dur in sorted(fam.items(), key=lambda kv: -kv[1])[:10]:
    print(f"  {dur/STEPS*1e6:8.1f} us/step {100*dur/total:5.1f}%  {name}")
print("-- copy shapes --")
for sh, (dur, n) in sorted(shapes.items(), key=lambda kv: -kv[1][0])[:8]:
    print(f"  {dur/STEPS*1e6:8.1f} us/step n={n:6d}  {sh}")
