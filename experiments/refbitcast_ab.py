"""A/B: in-kernel `pltpu.bitcast(w_ref[:], int4)` (array bitcast after a
u32 load) vs `w_ref.bitcast(int4)[...]` (int4-native VMEM reads) in the
grouped matvec. If the ref bitcast hits the native int4 load path it
should approach the int4-VMEM-ref probe (680-740 GB/s) instead of 556."""
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
sys.path.insert(0, "/root/repo/experiments")
from bitcast_matvec import pack_k8

G = 128


def make_kernel(K, mode):
    ngk = K // G

    def kernel(xq_ref, w_ref, sc_ref, o_ref):
        if mode == "array":
            w4 = pltpu.bitcast(w_ref[:], jnp.int4)
            read = lambda g: w4[g * G:(g + 1) * G, :]
        elif mode == "ref":
            wr = w_ref.bitcast(jnp.int4)
            read = lambda g: wr[g * G:(g + 1) * G, :]
        else:  # array-once-astype
            w8 = pltpu.bitcast(w_ref[:], jnp.int4).astype(jnp.int8)
            read = lambda g: None
        acc = None
        for g in range(ngk):
            if mode == "once":
                wg = w8[g * G:(g + 1) * G, :]
            else:
                wg = read(g).astype(jnp.int8)
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t = d.astype(jnp.float32) * sc_ref[g, :][None, :]
            acc = t if acc is None else acc + t
        o_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("K", "N", "tn", "mode"))
def matvec(xq, w32, scales, *, K, N, tn, mode):
    return pl.pallas_call(
        make_kernel(K, mode),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((8, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 8, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // G, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * N * K, bytes_accessed=K * N // 2,
            transcendentals=0),
    )(xq, w32, scales)


def bench(K, N, mode, iters=2000):
    rng = np.random.default_rng(1)
    codes = rng.integers(-8, 8, (K, N)).astype(np.int8)
    w32 = jnp.asarray(pack_k8(codes, True))
    scales = jnp.asarray(rng.uniform(0.5, 2.0, (K // G, N)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (8, K)), jnp.int8)

    @jax.jit
    def loop(xq, n):
        def body(i, x):
            y = matvec(x, w32, scales, K=K, N=N, tn=512, mode=mode)
            dep = (y[0, 0] > jnp.float32(1e30)).astype(jnp.int8)
            return x + dep
        return jax.lax.fori_loop(0, n, body, xq)

    # correctness once
    y = np.asarray(matvec(xq, w32, scales, K=K, N=N, tn=512, mode=mode))
    exp = np.zeros((8, N), np.float32)
    for g in range(K // G):
        d = xq[:, g*G:(g+1)*G].astype(np.int32) @ codes[g*G:(g+1)*G].astype(np.int32)
        exp += d * np.asarray(scales[g])[None, :]
    ok = np.allclose(y, exp)
    r = loop(xq, 10); _ = np.asarray(r[0, 0])
    t0 = time.time(); r = loop(xq, iters); _ = np.asarray(r[0, 0])
    dt = time.time() - t0
    us = dt / iters * 1e6
    gbs = (K * N / 2) / (dt / iters) / 1e9
    print(f"  {mode:6s} {K}x{N}: {us:7.1f} us  {gbs:6.0f} GB/s  "
          f"{'OK' if ok else 'WRONG'}", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    for mode in ("array", "ref", "once"):
        for K, N in [(4096, 12288), (4096, 22016), (11008, 4096)]:
            try:
                bench(K, N, mode)
            except Exception as e:
                print(f"  {mode} {K}x{N}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
