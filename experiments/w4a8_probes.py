"""Decisive probes for the M=1 w4a8 wall (all timing-only, numerics ignored
where noted).

  P-int8  : grouped dots, weights PRE-UNPACKED int8 (2x HBM bytes, no unpack)
  P-flat  : packed int4 + V2 unpack, ONE deep dot per K-tile (numerics wrong
            for g128 -- perf probe of dot granularity)
  P-nodot : packed int4 + V2 unpack, dots REPLACED by a cheap reduce
            (probe: unpack+DMA alone)
"""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from neural_compressor_tpu.ops.qtensor import quantize_tensor, quantize_act_per_token
from neural_compressor_tpu.ops.packing import pack_qtensor

P, BITS, HALF = 8, 4, 8

def timeit(fn, x, K, N, iters, label, bytes_n):
    @jax.jit
    def run(x, n):
        def body(i, x):
            y = fn(x)
            return (y[:, :K] if N >= K else
                    jnp.tile(y, (1, K // N + 1))[:, :K]).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)
    _ = np.asarray(run(x, 2).ravel()[0])
    t0 = time.time()
    _ = np.asarray(run(x, iters).ravel()[0])
    us = (time.time() - t0) / iters * 1e6
    print(f"  {label:10s} K={K:6d} N={N:6d}: {us:7.1f} us "
          f"({bytes_n/us/1e3:4.0f} GB/s of its own bytes, "
          f"{K*N/2/us/1e3:4.0f} GB/s int4-equiv)", flush=True)

def kern_int8(G, ngk, nk):
    def kernel(xq_ref, w_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
        acc = acc_ref[:]
        for g in range(ngk):
            codes = w_ref[g * G:(g + 1) * G, :]
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(xg, codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32) * sc_ref[0, g]
        acc_ref[:] = acc
        @pl.when(k == nk - 1)
        def _(): o_ref[:] = acc_ref[:]
    return kernel

def kern_flat(G, ngk, nk, mode):
    rpg = G // P
    def kernel(xq_ref, pk_ref, sc_ref, o_ref, acc_ref):
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (P, 1, 1), 0) * BITS
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
        TN = pk_ref.shape[-1]
        pk = pk_ref[:].reshape(1, ngk * rpg, TN)
        c = ((pk >> shifts) & 15).astype(jnp.int32)
        # [P, ngk*rpg, TN] -> [ngk*G, TN]; row order wrong vs packing but
        # element count/layout right (perf probe)
        codes = c.reshape(ngk * G, TN).astype(jnp.int8)
        if mode == "flat":
            d = jax.lax.dot_general(xq_ref[:], codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_ref[:] = acc_ref[:] + d.astype(jnp.float32) * sc_ref[0, 0]
        else:  # nodot: cheap per-lane reduce so unpack can't fold away
            acc_ref[:] = acc_ref[:] + jnp.sum(
                codes.astype(jnp.float32).reshape(-1, 32, TN)[:, :1, :] , axis=0)
        @pl.when(k == nk - 1)
        def _(): o_ref[:] = acc_ref[:]
    return kernel

def largest_tk(K, G, cap):
    ng = K // G; t = G
    for m in range(1, ng + 1):
        if ng % m == 0 and m * G <= cap: t = m * G
    return t

def main():
    print("device:", jax.devices(), flush=True)
    G = 128
    for K, N in ((4096, 12288), (4096, 22016), (11008, 4096)):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        qt = quantize_tensor(w, bits=4, group_size=G, scheme="sym")
        pw = pack_qtensor(qt)
        w8 = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int8)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
        tm, tn = 32, 512

        # P-int8
        tk8 = largest_tk(K, G, 3072)
        nk, ngk = K // tk8, tk8 // G
        sc = pw.scales.astype(jnp.float32).reshape(nk, ngk, N)
        def f_int8(xx, tk=tk8, nk=nk, ngk=ngk, sc=sc):
            xq, xs = quantize_act_per_token(xx.reshape(-1, K), bits=8)
            xq = jnp.pad(xq, ((0, tm - 1), (0, 0)))
            y = pl.pallas_call(kern_int8(G, ngk, nk), grid=(1, N // tn, nk),
                in_specs=[
                    pl.BlockSpec((tm, tk), lambda i,j,k: (i,k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tk, tn), lambda i,j,k: (k,j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ngk, tn), lambda i,j,k: (k,0,j), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((tm, tn), lambda i,j,k: (i,j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((tm, N), jnp.float32),
                scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel","parallel","arbitrary")),
                cost_estimate=pl.CostEstimate(flops=2*tm*N*K,
                    bytes_accessed=K*N, transcendentals=0),
            )(xq, w8, sc)
            return (y[:1] * xs).astype(xx.dtype)
        timeit(f_int8, x, K, N, 2000, "P-int8", K * N)

        # P-flat / P-nodot
        tk = largest_tk(K, G, 6144)
        nk, ngk = K // tk, tk // G
        sc = pw.scales.astype(jnp.float32).reshape(nk, ngk, N)
        for mode in ("flat", "nodot"):
            def f_flat(xx, tk=tk, nk=nk, ngk=ngk, sc=sc, mode=mode):
                xq, xs = quantize_act_per_token(xx.reshape(-1, K), bits=8)
                xq = jnp.pad(xq, ((0, tm - 1), (0, 0)))
                y = pl.pallas_call(kern_flat(G, ngk, nk, mode), grid=(1, N // tn, nk),
                    in_specs=[
                        pl.BlockSpec((tm, tk), lambda i,j,k: (i,k), memory_space=pltpu.VMEM),
                        pl.BlockSpec((tk // P, tn), lambda i,j,k: (k,j), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, ngk, tn), lambda i,j,k: (k,0,j), memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((tm, tn), lambda i,j,k: (i,j), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((tm, N), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel","parallel","arbitrary")),
                    cost_estimate=pl.CostEstimate(flops=2*tm*N*K,
                        bytes_accessed=K*N//2, transcendentals=0),
                )(xq, pw.packed, sc)
                return (y[:1] * xs).astype(xx.dtype)
            timeit(f_flat, x, K, N, 2000, f"P-{mode}", K * N // 2)

if __name__ == "__main__":
    main()
