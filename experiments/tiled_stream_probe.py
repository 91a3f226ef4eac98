"""Round-4 probe: is the fused matvec's ~400 GB/s weight stream limited by
STRIDED block DMAs?

A (K/8, tn) block of a row-major [K/8, N] u32 buffer reads K/8 separate
tn*4-byte row chunks (1-2 KB each). A TILED layout [N/tn, K/8, tn] makes
each block one contiguous multi-MB DMA. This probe measures the pure
block-stream rate of both layouts (kernel reads the block, consumes 8 rows
— the DMA cost is layout-determined, the compute is negligible), chained
2000x with a loop-carried dependency so XLA cannot hoist or overlap
iterations.
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


def make_call(layout, K8, N, tn):
    nn = N // tn

    def kern(x_ref, w_ref, o_ref, acc):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[...] = x_ref[...]

        blk = w_ref[...]
        blk2 = blk.reshape(-1, tn) if blk.ndim == 3 else blk
        s = jnp.sum(pltpu.bitcast(blk2[0:8, :], jnp.int32).astype(
            jnp.float32))
        acc[...] += s

        @pl.when(j == nn - 1)
        def _():
            o_ref[...] = acc[...]

    if layout == "strided":
        in_spec = pl.BlockSpec((K8, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((1, K8, tn), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM)

    def call(x, arr):
        return pl.pallas_call(
            kern,
            grid=(nn,),
            in_specs=[pl.BlockSpec((8, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM), in_spec],
            out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, arr)

    return call


@functools.partial(jax.jit, static_argnames=("layout", "K8", "N", "tn"))
def chain(x, arr, iters, *, layout, K8, N, tn):
    call = make_call(layout, K8, N, tn)
    return jax.lax.fori_loop(0, iters, lambda i, x: call(x, arr), x)


def measure(K, N, tn, layout, iters=2000):
    K8 = K // 8
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(0, 2**32, (K8, N), dtype=np.uint32))
    if layout == "tiled":
        nn = N // tn
        w = jnp.asarray(w.reshape(K8, nn, tn).transpose(1, 0, 2))
    x = jnp.zeros((8, 128), jnp.float32)
    out = chain(x, w, 10, layout=layout, K8=K8, N=N, tn=tn)
    _ = np.asarray(out)
    t0 = time.time()
    out = chain(x, w, iters, layout=layout, K8=K8, N=N, tn=tn)
    _ = np.asarray(out)
    dt = time.time() - t0
    gbs = K8 * N * 4 * iters / dt / 1e9
    us = dt / iters * 1e6
    print(f"K={K:6d} N={N:6d} tn={tn:5d} {layout:8s}"
          f" {us:8.1f} us/pass  {gbs:7.1f} GB/s", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    for K, N, tag in ((14336, 4096, "down"), (4096, 28672, "gate-up"),
                      (4096, 6144, "qkv"), (4096, 4096, "o")):
        print(f"--- {tag} [{K}x{N}] ({K*N*4/8/1e6:.1f} MB u32) ---",
              flush=True)
        for tn in (256, 512):
            measure(K, N, tn, "strided")
        for tn in (256, 512, 1024):
            if (K // 8) * tn * 4 * 2 <= 14 * 1024 * 1024 and N % tn == 0:
                measure(K, N, tn, "tiled")


if __name__ == "__main__":
    main()
