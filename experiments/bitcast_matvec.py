"""Can the grouped W4A8 matvec kernel take RAW uint32 words and unpack
in-kernel via pltpu.bitcast (u32 [tk/8, tn] -> int4 [tk, tn]) at the same
680-740 GB/s the XLA-level s4 view reaches?

Why it matters (round-3 profile): the s4_view materialization does NOT
stay hoisted in the full model — XLA rematerializes view+layout-copy
inside the decode loop (~0.7 ms/step), and the view blocks TP shard_map.
If the in-kernel bitcast hits the hardware int4 unpack, the XLA-level s4
array disappears entirely: no remat, no layout copy, TP-compatible.

Run on TPU. Prints nibble-order probe + GB/s per fused decode shape.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

G = 128


def pack_k8(codes, low_first=True):
    """int8 codes [K, N] in [-8, 7] -> uint32 [K/8, N], 8 K-direction
    nibbles per word (row k=8r+j in nibble j if low_first)."""
    K, N = codes.shape
    u = (codes.astype(np.int32) & 0xF).astype(np.uint32).reshape(K // 8, 8, N)
    w = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        shift = 4 * j if low_first else 4 * (7 - j)
        w |= u[:, j, :] << shift
    return w


def _make_kernel(ngk, nk):
    def kernel(xq_ref, w_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w4 = pltpu.bitcast(w_ref[:], jnp.int4)  # [tk, tn]
        acc = acc_ref[:]
        for g in range(ngk):
            wg = w4[g * G:(g + 1) * G, :].astype(jnp.int8)
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32) * sc_ref[0, g]
        acc_ref[:] = acc

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("K", "N", "tm", "tn", "tk"))
def u32_matmul(xq, w32, scales, *, K, N, tm, tn, tk):
    M = xq.shape[0]
    nm, nn, nk = M // tm, N // tn, K // tk
    ngk = tk // G
    scales = scales.reshape(nk, ngk, N)
    return pl.pallas_call(
        _make_kernel(ngk, nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 8, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ngk, tn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=xq.size + K * N // 2 + scales.size * 4
            + M * N * 4,
            transcendentals=0),
    )(xq, w32, scales)


def correctness():
    rng = np.random.default_rng(0)
    K, N, tm, tn, tk = 256, 256, 8, 256, 256
    codes = rng.integers(-8, 8, (K, N)).astype(np.int8)
    scales = rng.uniform(0.5, 2.0, (K // G, N)).astype(np.float32)
    xq = rng.integers(-127, 128, (tm, K)).astype(np.int8)
    expect = np.zeros((tm, N), np.float32)
    for g in range(K // G):
        d = xq[:, g * G:(g + 1) * G].astype(np.int32) @ \
            codes[g * G:(g + 1) * G].astype(np.int32)
        expect += d.astype(np.float32) * scales[g]
    for low_first in (True, False):
        w32 = jnp.asarray(pack_k8(codes, low_first))
        y = np.asarray(u32_matmul(jnp.asarray(xq), w32, jnp.asarray(scales),
                                  K=K, N=N, tm=tm, tn=tn, tk=tk))
        ok = np.allclose(y, expect)
        print(f"  low_first={low_first}: {'MATCH' if ok else 'mismatch'} "
              f"(maxerr {np.abs(y-expect).max():.1f})", flush=True)
        if ok:
            return low_first
    raise SystemExit("neither nibble order matches")


def bench_shape(K, N, tk, low_first, iters=2000):
    rng = np.random.default_rng(1)
    codes = rng.integers(-8, 8, (K, N)).astype(np.int8)
    w32 = jnp.asarray(pack_k8(codes, low_first))
    scales = jnp.asarray(rng.uniform(0.5, 2.0, (K // G, N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (8, K)), jnp.int8)

    @jax.jit
    def loop(xq, w32, scales, n):
        def body(i, x):
            y = u32_matmul(x, w32, scales, K=K, N=N, tm=8, tn=256, tk=tk)
            # data dependency to chain iterations (always adds 0)
            dep = (y[0, 0] > jnp.float32(1e30)).astype(jnp.int8)
            return x + dep
        return jax.lax.fori_loop(0, n, body, xq)

    r = loop(xq, w32, scales, 10)
    _ = np.asarray(r[0, 0])
    t0 = time.time()
    r = loop(xq, w32, scales, iters)
    _ = np.asarray(r[0, 0])
    dt = time.time() - t0
    us = dt / iters * 1e6
    gbs = (K * N / 2) / (dt / iters) / 1e9
    print(f"  {K}x{N} tk={tk}: {us:7.1f} us  {gbs:6.0f} GB/s", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    print("nibble-order probe:", flush=True)
    low_first = correctness()
    print(f"order resolved: low_first={low_first}", flush=True)
    for K, N, tk in [(4096, 12288, 4096), (4096, 22016, 4096),
                     (11008, 4096, 5504), (4096, 4096, 4096)]:
        bench_shape(K, N, tk, low_first)


if __name__ == "__main__":
    main()
