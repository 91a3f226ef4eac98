"""Per-shard kernel probe for TP serving (single-chip emulation).

Round-2 VERDICT Weak #2: TP modules were locked to the tpu_strided
shift-plane kernels (353-397 GB/s) because the s4 view could not cross a
shard_map. The "u4_kpack" layout removes that constraint — this probe runs
the SHARD-LOCAL llama2-7b shapes (tp=8: column shards keep K, cut N;
row shards cut K) through both kernels at M=1 and reports effective GB/s
on the packed-weight stream.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from neural_compressor_tpu.kernels.fused_matvec import u4k_matmul
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
from neural_compressor_tpu.ops.packing import (pack_qtensor, to_u4_kpack)
from neural_compressor_tpu.ops.qtensor import quantize_tensor

G = 128
TP = 8
# llama3-8b shard-local shapes (H=4096, I=14336, GQA qkv N=6144): every
# dim stays 128-aligned with whole g128 groups at tp=8 — llama2-7b's
# I=11008 (43*256) only shards cleanly at tp=2, so 8B is the TP target.
SHAPES = [
    ("qkv col", 4096, 6144 // TP),
    ("o row", 4096 // TP, 4096),
    ("gate_up col", 4096, 2 * 14336 // TP),
    ("down row", 14336 // TP, 4096),
    # tp=2 shapes (llama2-7b clean case)
    ("qkv col tp2", 4096, 12288 // 2),
    ("gate_up tp2", 4096, 22016 // 2),
    ("down tp2", 11008 // 2, 4096),
]


def bench(name, K, N, layout, iters=3000):
    rng = np.random.default_rng(0)
    kern = (rng.normal(size=(K, N)) * 0.05).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(kern), bits=4, group_size=G,
                         scheme="sym", dtype="int")
    pw = pack_qtensor(qt)
    if layout == "u4_kpack":
        pw = to_u4_kpack(pw)
        mm = u4k_matmul
    else:
        mm = w4a8_matmul
    x = jnp.asarray(rng.normal(size=(1, K)), jnp.bfloat16)

    @jax.jit
    def loop(x, n):
        def body(i, x):
            y = mm(x, pw)
            dep = (y[0, 0] > jnp.bfloat16(1e30)).astype(x.dtype)
            return x + dep
        return jax.lax.fori_loop(0, n, body, x)

    r = loop(x, 8); _ = np.asarray(r[0, 0], np.float32)
    t0 = time.time(); r = loop(x, iters); _ = np.asarray(r[0, 0], np.float32)
    dt = time.time() - t0
    us = dt / iters * 1e6
    gbs = (K * N / 2) / (dt / iters) / 1e9
    print(f"  {name:12s} {K:5d}x{N:5d} {layout:12s} {us:7.1f} us "
          f"{gbs:6.0f} GB/s", flush=True)
    return gbs


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    for name, K, N in SHAPES:
        for layout in ("tpu_strided", "u4_kpack"):
            try:
                bench(name, K, N, layout)
            except Exception as e:
                print(f"  {name} {layout}: FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
