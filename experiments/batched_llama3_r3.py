"""Batched decode on llama3-8b (GQA rep=4): the grouped code-domain
attention reads the 8-KV-head int8 cache without materializing the 4x
repeated K/V. W4A8 serving + quantized lm_head + int8 KV, T=1024.
"""
import sys
import time

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
from decode_ab import build_decode

STEPS = 64


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama3-8b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    nf = fuse_for_serving(qmodel)
    nw = to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s ({nf} fused, {nw} w4a8)", flush=True)

    for batch in (96, 128):
        try:
            state, make_caches, decode = build_decode(
                qmodel, batch, 1024, quant_kv=True)
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
            print(f"B={batch}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
