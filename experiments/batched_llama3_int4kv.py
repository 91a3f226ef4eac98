"""llama3-8b batched decode: s4_rowpack weights + PACKED INT4 KV cache.
int4 KV halves cache bytes vs int8 - B sweep extends to 192/256 slots.
Same protocol as batched_llama3_final.py (W4A8 + q-lm_head + int8 KV,
T=1024); decode_ab.build_decode runs s4_prepare before the loop."""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/experiments")
import jax, jax.numpy as jnp, numpy as np
import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import LLAMA_PRESETS, LlamaConfig, build_quantized
from neural_compressor_tpu.quantization.fuse import fuse_for_serving, to_w4a8_serving
from decode_ab import build_decode

STEPS = 64

def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama3-8b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    nf = fuse_for_serving(qmodel)
    nw = to_w4a8_serving(qmodel)  # auto -> s4 on TPU
    print(f"build {time.time()-t0:.0f}s ({nf} fused, {nw} w4a8-s4)", flush=True)

    for batch in (16, 64, 128, 160, 192, 256):
        try:
            state, make_caches, decode = build_decode(
                qmodel, batch, 1024, quant_kv="int4")
            tok = jnp.zeros((batch, 1), dtype=jnp.int32)
            t0 = time.time()
            _, _, acc = decode(state, make_caches(), tok, 4)
            _ = np.asarray(acc)
            print(f"B={batch} compile {time.time()-t0:.0f}s", flush=True)
            t0 = time.time()
            _, _, acc = decode(state, make_caches(), tok, STEPS)
            _ = np.asarray(acc)
            wall = time.time() - t0
            print(f"B={batch}: {wall/STEPS*1e3:.2f} ms/step "
                  f"({batch*STEPS/wall:.1f} tok/s)", flush=True)
        except Exception as e:
            print(f"B={batch}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

if __name__ == "__main__":
    main()
