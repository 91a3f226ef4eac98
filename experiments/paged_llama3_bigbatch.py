"""Round-5: llama3-8b LARGE-batch decode through the paged pools.

The contiguous int4-KV batched path runs the XLA code-domain attention
(no batched-kernel int4 support) and saturates ~2450 tok/s at B>=64 —
below int8-KV's 4288 at B=128 — although it unlocks B=256 (int8 caches
no longer fit). The paged v2 kernel DOES consume int4 affine pools at
speed, so batched int4 serving should ride the paged pool: sweep
B in {64, 128, 192, 256} x {int8, int4} pools, fully-allocated block
tables, T=1024.
"""
import itertools
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
from paged_v2_ab import build_paged_decode

STEPS = 64


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    m = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama3-8b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(m)
    to_w4a8_serving(m)
    print(f"build {time.time()-t0:.0f}s", flush=True)

    for B, fmt in itertools.product((64, 128, 192, 256),
                                    ("int4", "int8")):
        try:
            st, mk, dec = build_paged_decode(m, B, quantized=fmt)
            tok = jnp.zeros((B, 1), jnp.int32)
            _, _, a = dec(st, mk(), tok, 4)
            _ = np.asarray(a)
            t0 = time.time()
            _, _, a = dec(st, mk(), tok, STEPS)
            _ = np.asarray(a)
            dt = (time.time() - t0) / STEPS
            print(f"B={B:3d} {fmt}-pool: {dt*1e3:6.2f} ms/step  "
                  f"{B/dt:7.1f} tok/s", flush=True)
        except Exception as e:
            print(f"B={B} {fmt} FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
