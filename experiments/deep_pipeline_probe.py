"""Round-4 probe 2: what sets the ~760 GB/s marginal rate and the
~13 us/call fixed cost of Mosaic block pipelines?

(experiments/tiled_stream_probe.log fits time = 13.2 us + bytes/760 GB/s
on every shape; layout — strided vs tiled — is irrelevant.)

Measures, all chained 2000x with loop-carried dependencies:
  1. empty kernel (grid=1, one tiny operand): pure launch cost
  2. manual ring-buffer streaming from an HBM-pinned operand with
     nbuf in {2, 3, 4, 6} in-flight DMAs and chunk sizes 0.5-4 MB —
     does deeper buffering beat the auto-pipeline's double buffer?
  3. XLA reduction of the same buffer (the 954 GB/s reference)
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

R, C = 1792, 4096  # 29.4 MB u32 (the llama3 down projection)


def timed(fn, x, w, iters=2000, label="", bytes_per=0):
    out = fn(x, w, 10)
    _ = np.asarray(out)
    t0 = time.time()
    out = fn(x, w, iters)
    _ = np.asarray(out)
    dt = time.time() - t0
    us = dt / iters * 1e6
    gbs = bytes_per * iters / dt / 1e9 if bytes_per else 0.0
    print(f"{label:42s} {us:8.2f} us/pass  {gbs:7.1f} GB/s", flush=True)


# 1. empty kernel launch cost ------------------------------------------------

def _empty_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


@jax.jit
def empty_chain(x, w, iters):
    def call(x):
        return pl.pallas_call(
            _empty_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)
    return jax.lax.fori_loop(0, iters, lambda i, x: call(x), x)


# 2. manual ring-buffer stream ----------------------------------------------

def make_ring(nbuf, chunk_rows):
    ngrid = R // chunk_rows

    def kern(x_ref, w_hbm, o_ref, buf, acc, sem):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[...] = x_ref[...]
            for s in range(min(nbuf, ngrid)):
                pltpu.make_async_copy(
                    w_hbm.at[pl.ds(s * chunk_rows, chunk_rows)],
                    buf.at[s], sem.at[s]).start()

        slot = jax.lax.rem(j, nbuf)
        pltpu.make_async_copy(
            w_hbm.at[pl.ds(j * chunk_rows, chunk_rows)],
            buf.at[slot], sem.at[slot]).wait()
        s = jnp.sum(pltpu.bitcast(buf[slot, 0:8, :], jnp.int32)
                    .astype(jnp.float32))
        acc[...] += s

        @pl.when(j + nbuf < ngrid)
        def _():
            nxt = j + nbuf
            pltpu.make_async_copy(
                w_hbm.at[pl.ds(nxt * chunk_rows, chunk_rows)],
                buf.at[slot], sem.at[slot]).start()

        @pl.when(j == ngrid - 1)
        def _():
            o_ref[...] = acc[...]

    @jax.jit
    def chain(x, w, iters):
        def call(x):
            return pl.pallas_call(
                kern,
                grid=(ngrid,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, chunk_rows, C), jnp.uint32),
                    pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x, w)
        return jax.lax.fori_loop(0, iters, lambda i, x: call(x), x)

    return chain


# 3. XLA reference -----------------------------------------------------------

@jax.jit
def xla_chain(x, w, iters):
    def body(i, x):
        # xor with a carry-derived scalar so the reduction can't be
        # hoisted out of the loop (it fuses; no materialization)
        t = x[0, 0].astype(jnp.uint32)
        s = jnp.sum(w ^ t, dtype=jnp.uint32).astype(jnp.float32)
        return x + s * 1e-30
    return jax.lax.fori_loop(0, iters, body, x)


def main():
    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(0, 2**32, (R, C), dtype=np.uint32))
    x = jnp.zeros((8, 128), jnp.float32)
    nbytes = R * C * 4

    timed(empty_chain, x, w, label="empty kernel (launch cost)")
    timed(xla_chain, x, w, label="XLA sum (reference)", bytes_per=nbytes)
    for chunk_rows in (32, 64, 128, 256):
        for nbuf in (2, 3, 4, 6):
            if nbuf * chunk_rows * C * 4 > 13 * 1024 * 1024:
                continue
            if R % chunk_rows:
                continue
            mb = chunk_rows * C * 4 / 1e6
            timed(make_ring(nbuf, chunk_rows), x, w,
                  label=f"ring nbuf={nbuf} chunk={mb:.1f}MB",
                  bytes_per=nbytes)


if __name__ == "__main__":
    main()
