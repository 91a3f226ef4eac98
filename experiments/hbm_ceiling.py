"""Measure the practical HBM streaming ceiling on this v5e chip.

Three probes, all chained fori_loop with real data dependencies:
  1. XLA sum-reduce of a large bf16 array (pure read).
  2. XLA sum-reduce of a large uint32 array (packed-int4-like read).
  3. Minimal pallas kernel: per-tile sum of a packed uint32 array.
If these land ~800 GB/s, the decode kernels (~360-390) have headroom;
if ~400, the chip's practical single-core stream IS the roofline.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("device:", jax.devices(), flush=True)

def timeit(fn, x, iters, bytes_per_iter, name):
    r = fn(x, 3)
    _ = np.asarray(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    r = fn(x, iters)
    _ = np.asarray(jax.tree.leaves(r)[0].ravel()[0])
    dt = time.perf_counter() - t0
    gbs = bytes_per_iter * iters / dt / 1e9
    print(f"{name}: {dt/iters*1e6:.1f} us/iter -> {gbs:.0f} GB/s", flush=True)

# 1 GiB bf16 array
N = 512 * 1024 * 1024  # elements
x = jnp.ones((N,), jnp.bfloat16)

@jax.jit
def red_bf16(x, iters):
    def body(i, carry):
        s, x = carry
        return (s + jnp.sum(x) * (1.0 + 1e-9 * i), x)
    s, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x))
    return s
timeit(red_bf16, x, 30, N * 2, "XLA sum bf16 1GiB")

xu = jnp.ones((N // 2,), jnp.uint32)  # same bytes
@jax.jit
def red_u32(x, iters):
    def body(i, carry):
        s, x = carry
        return (s + jnp.sum(x.astype(jnp.int32)) + i, x)
    s, _ = jax.lax.fori_loop(0, iters, body, (jnp.int32(0), x))
    return s
timeit(red_u32, xu, 30, N * 2, "XLA sum u32 1GiB")

# pallas tile-sum over a [K/8, N] uint32 "packed" array, grid like the kernel
K, Nw = 8192, 16384   # 0.5 GiB packed
pk = jnp.ones((K // 8, Nw), jnp.uint32)
def mk(tk, tn, nk, nn):
    def kernel(pk_ref, o_ref, acc):
        j, k = pl.program_id(0), pl.program_id(1)
        @pl.when((j == 0) & (k == 0))
        def _(): acc[0, 0] = jnp.float32(0)
        acc[0, 0] += jnp.sum(pk_ref[:].astype(jnp.int32)).astype(jnp.float32)
        @pl.when((j == nn - 1) & (k == nk - 1))
        def _(): o_ref[0, 0] = acc[0, 0]
    return kernel
def tile_sum(pk, tk, tn):
    nk, nn = K // tk, Nw // tn
    return pl.pallas_call(
        mk(tk, tn, nk, nn), grid=(nn, nk),
        in_specs=[pl.BlockSpec((tk // 8, tn), lambda j, k: (k, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda j, k: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(pk)
for tk, tn in [(4096, 256), (8192, 256), (4096, 512), (2048, 1024)]:
    @jax.jit
    def loop(pk, iters, tk=tk, tn=tn):
        def body(i, carry):
            s, pk = carry
            return (s + tile_sum(pk, tk, tn)[0, 0] + i, pk)
        s, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), pk))
        return s
    timeit(loop, pk, 50, K * Nw // 2, f"pallas tile-sum tk={tk} tn={tn}")
