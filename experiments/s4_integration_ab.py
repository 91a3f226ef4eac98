"""Isolate the s4 integration regression: per-call s4_view inside the loop
vs a hoisted int4 view materialized once before the loop."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from neural_compressor_tpu.ops.qtensor import quantize_tensor, quantize_act_per_token
from neural_compressor_tpu.ops.packing import pack_qtensor, to_s4_rowpack, s4_view
from neural_compressor_tpu.kernels.s4_matmul import s4_matmul, _make_kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def main():
    print("device:", jax.devices(), flush=True)
    G = 128
    for K, N in ((4096, 12288), (11008, 4096)):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        pw = to_s4_rowpack(pack_qtensor(quantize_tensor(w, bits=4, group_size=G, scheme="sym")))
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

        # A: package path (view per call, inside loop)
        @jax.jit
        def runA(x, packed, scales, n):
            pwl = pw._replace(packed=packed, scales=scales)
            def body(i, x):
                y = s4_matmul(x, pwl)
                y = y[:, :K] if N >= K else jnp.tile(y, (1, K // N + 1))[:, :K]
                return y.astype(jnp.bfloat16) * 1e-3
            return jax.lax.fori_loop(0, n, body, x)
        t0 = time.time()
        _ = np.asarray(runA(x, pw.packed, pw.scales, 2).ravel()[0])
        print(f"  A compile {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        _ = np.asarray(runA(x, pw.packed, pw.scales, 500).ravel()[0])
        usA = (time.time() - t0) / 500 * 1e6
        print(f"  A per-call view K={K} N={N}: {usA:7.1f} us ({K*N/2/usA/1e3:4.0f} GB/s)", flush=True)

        # B: hoisted view before loop
        tn = 512
        ng = K // G
        tk = G
        for m in range(1, ng + 1):
            if ng % m == 0 and m * G <= 6144: tk = m * G
        nk, ngk = K // tk, tk // G
        sc = pw.scales.astype(jnp.float32).reshape(nk, ngk, N)
        @jax.jit
        def runB(x, packed, n):
            w4 = jax.lax.optimization_barrier(s4_view(packed, K, N))
            def body(i, x):
                xq, xs = quantize_act_per_token(x, bits=8)
                xq = jnp.pad(xq, ((0, 31), (0, 0)))
                y = pl.pallas_call(_make_kernel(G, ngk, nk), grid=(1, N // tn, nk),
                    in_specs=[
                        pl.BlockSpec((32, tk), lambda i,j,k:(i,k), memory_space=pltpu.VMEM),
                        pl.BlockSpec((tk, tn), lambda i,j,k:(k,j), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, ngk, tn), lambda i,j,k:(k,0,j), memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((32, tn), lambda i,j,k:(i,j), memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((32, N), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((32, tn), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel","parallel","arbitrary")),
                    cost_estimate=pl.CostEstimate(flops=2*32*N*K,
                        bytes_accessed=K*N//2, transcendentals=0),
                )(xq, w4, sc)[:1] * xs
                y = y[:, :K] if N >= K else jnp.tile(y, (1, K // N + 1))[:, :K]
                return y.astype(jnp.bfloat16) * 1e-3
            return jax.lax.fori_loop(0, n, body, x)
        t0 = time.time()
        _ = np.asarray(runB(x, pw.packed, 2).ravel()[0])
        print(f"  B compile {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        _ = np.asarray(runB(x, pw.packed, 2000).ravel()[0])
        usB = (time.time() - t0) / 2000 * 1e6
        print(f"  B hoisted view  K={K} N={N}: {usB:7.1f} us ({K*N/2/usB/1e3:4.0f} GB/s)", flush=True)

if __name__ == "__main__":
    main()
