"""M=1 w4a8 kernel: unpack-cost variants.

Profile shows decode is 76% w4a8 kernels running ~360-390 GB/s while XLA
streams this chip at 954 GB/s (hbm_ceiling.log) -> the VPU unpack is the
wall, not DMA.  Variants:
  V0  current package kernel (per-plane list + stack + sub + cast)
  V1  one broadcast shift over a [P,1,1] shift vector (no stack copy)
  V2  V1 + unsigned codes (no sub): dot c in [0,15], correct with
      half * sum(xg) folded into the group accumulation
Each at tn=256 and tn=512.
"""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from neural_compressor_tpu.ops.qtensor import quantize_tensor, quantize_act_per_token
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul

P, BITS, HALF = 8, 4, 8

def mk_kernel(G, ngk, nk, variant):
    rpg = G // P

    def kernel(xq_ref, pk_ref, sc_ref, o_ref, acc_ref):
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (P, 1, 1), 0) * BITS
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        TN = pk_ref.shape[-1]
        pk = pk_ref[:].reshape(ngk, rpg, TN)
        acc = acc_ref[:]
        for g in range(ngk):
            if variant == 1:
                c = ((pk[g][None] >> shifts) & 15).astype(jnp.int32)
                codes = (c.reshape(G, TN) - HALF).astype(jnp.int8)
            elif variant == 2:
                c = ((pk[g][None] >> shifts) & 15).astype(jnp.int32)
                codes = c.reshape(G, TN).astype(jnp.int8)
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(
                xg, codes, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if variant == 2:
                xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
                d = d - HALF * xsum
            acc = acc + d.astype(jnp.float32) * sc_ref[0, g]
        acc_ref[:] = acc
        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]
    return kernel

@functools.partial(jax.jit, static_argnames=("G","K","N","tn","tk","variant"))
def w4a8_var(x, packed, scales, *, G, K, N, tn, tk, variant):
    xq, x_scale = quantize_act_per_token(x.reshape(-1, K), bits=8)
    M = xq.shape[0]; tm = 32
    xq = jnp.pad(xq, ((0, tm - M), (0, 0)))
    nk, nn = K // tk, N // tn
    ngk = tk // G
    sc = scales.astype(jnp.float32).reshape(nk, ngk, N)
    y = pl.pallas_call(
        mk_kernel(G, ngk, nk, variant),
        grid=(1, nn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i,j,k: (i,k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // P, tn), lambda i,j,k: (k,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ngk, tn), lambda i,j,k: (k,0,j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i,j,k: (i,j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel","parallel","arbitrary")),
        cost_estimate=pl.CostEstimate(flops=2*tm*N*K,
            bytes_accessed=xq.size + packed.size*4 + sc.size*4 + tm*N*4,
            transcendentals=0),
    )(xq, packed, sc)
    return (y[:M] * x_scale).astype(x.dtype)

def largest_tk(K, G, cap=6144):
    ng = K // G; t = G
    for m in range(1, ng + 1):
        if ng % m == 0 and m * G <= cap: t = m * G
    return t

def bench(K, N, fn, label, iters=2000):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=128, scheme="sym"))
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    ref = w4a8_matmul(x, pw)
    out = fn(x, pw)
    rel = float(jnp.linalg.norm(out.astype(jnp.float32) - ref.astype(jnp.float32))
                / (jnp.linalg.norm(ref) + 1e-9))
    @jax.jit
    def run(x, n):
        def body(i, x):
            y = fn(x, pw)
            return (y[:, :K] if N >= K else
                    jnp.tile(y, (1, K // N + 1))[:, :K]).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)
    _ = np.asarray(run(x, 2).ravel()[0])
    t0 = time.time()
    _ = np.asarray(run(x, iters).ravel()[0])
    us = (time.time() - t0) / iters * 1e6
    print(f"  {label:14s} K={K:6d} N={N:6d}: {us:7.1f} us ({K*N/2/us/1e3:4.0f} GB/s) rel={rel:.4f}",
          flush=True)

def main():
    print("device:", jax.devices(), flush=True)
    for K, N in ((4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)):
        tk = largest_tk(K, 128)
        bench(K, N, lambda x, pw: w4a8_matmul(x, pw), "V0-pkg")
        for variant in (1, 2):
            for tn in (256, 512):
                bench(K, N, functools.partial(
                    w4a8_var, packed=None, scales=None) if False else
                    (lambda x, pw, v=variant, t=tn, tk=tk, K=K, N=N:
                     w4a8_var(x, pw.packed, pw.scales, G=128, K=K, N=N,
                              tn=t, tk=tk, variant=v)),
                    f"V{variant}-tn{tn}")

if __name__ == "__main__":
    main()
