"""Round-4: does int8 KV now WIN at B=1 on the fused decode path?

The [.., T, 1] scale operands of the fused quant attention kernels were
lane-pad phantoms (128x physical, re-materialized per layer per step —
kvscale_copy_hlo.py), plausibly the whole reason "int8-KV loses at B=1"
(PERF_NOTES round 3). After the [B, Hkv, 1, T] re-layout, A/B bf16-KV
vs int8-KV on the full fused W4A8 serving path (the bench program),
llama2-7b and llama3-8b, B=1 T=1024.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

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

STEPS = 256
T = 1024


def main():
    print("device:", jax.devices(), flush=True)
    presets = [a for a in sys.argv[1:] if not a.startswith("-")] \
        or ["llama2-7b", "llama3-8b"]
    for preset in presets:
        t0 = time.time()
        m = build_quantized(
            LlamaConfig(**LLAMA_PRESETS[preset]),
            nq.RTNConfig(dtype="int4", group_size=128,
                         quant_lm_head=True))
        fuse_for_serving(m)
        to_w4a8_serving(m)
        enable_fused_decode(m)
        print(f"{preset} build {time.time()-t0:.0f}s", flush=True)
        for label, qkv in (("bf16-KV", False), ("int8-KV", True),
                           ("fp8-KV", "fp8_e4m3")):
            try:
                st, mk, dec = build_decode(m, 1, T, quant_kv=qkv)
                tok = jnp.zeros((1, 1), jnp.int32)
                _, _, a = dec(st, mk(), tok, 4)
                _ = np.asarray(a)
                t0 = time.time()
                _, _, a = dec(st, mk(), tok, STEPS)
                _ = np.asarray(a)
                dt = (time.time() - t0) / STEPS
                print(f"{preset} {label:8s} {dt*1e3:6.2f} ms/tok  "
                      f"{1/dt:6.1f} tok/s", flush=True)
            except Exception as e:
                print(f"{preset} {label} FAILED {type(e).__name__}: {e}",
                      flush=True)
        del m


if __name__ == "__main__":
    main()
