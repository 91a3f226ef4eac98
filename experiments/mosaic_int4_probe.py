"""Does Mosaic accept int4 refs in VMEM, and is its astype(int8) faster
than our shift-plane unpack?  Also: int4 codes fed STRAIGHT to the MXU dot.
"""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")

G = 128

def kern(ngk, nk, mode):
    def kernel(xq_ref, w_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
        acc = acc_ref[:]
        for g in range(ngk):
            wg = w_ref[g * G:(g + 1) * G, :]
            if mode == "cvt":
                wg = wg.astype(jnp.int8)
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(xg, wg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32) * sc_ref[0, g]
        acc_ref[:] = acc
        @pl.when(k == nk - 1)
        def _(): o_ref[:] = acc_ref[:]
    return kernel

def main():
    print("device:", jax.devices(), flush=True)
    for K, N in ((4096, 12288), (4096, 22016), (11008, 4096)):
        rng = np.random.default_rng(0)
        w8 = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int8)
        sc = jnp.asarray(rng.standard_normal((K // G, N)).astype(np.float32) * 0.01)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
        tm, tn = 32, 512
        ng = K // G
        tk = G
        for m in range(1, ng + 1):
            if ng % m == 0 and m * G <= 6144: tk = m * G
        nk, ngk = K // tk, tk // G
        scr = sc.reshape(nk, ngk, N)

        for mode in ("cvt", "raw"):
            def mk():
                @jax.jit
                def run(w8, x, n):
                    w4 = jax.lax.optimization_barrier(w8.astype(jnp.int4))
                    def body(i, x):
                        xq = jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
                        xq = jnp.pad(xq, ((0, tm - 1), (0, 0)))
                        y = pl.pallas_call(kern(ngk, nk, mode), grid=(1, N // tn, nk),
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
                                bytes_accessed=K*N//2, transcendentals=0),
                        )(xq, w4, scr)[:1]
                        y = y[:, :K] if N >= K else jnp.tile(y, (1, K // N + 1))[:, :K]
                        return y.astype(jnp.bfloat16) * 1e-3
                    return jax.lax.fori_loop(0, n, body, x)
                return run
            try:
                run = mk()
                _ = np.asarray(run(w8, x, 2).ravel()[0])
                t0 = time.time()
                _ = np.asarray(run(w8, x, 1000).ravel()[0])
                us = (time.time() - t0) / 1000 * 1e6
                print(f"  M-{mode:4s} K={K:6d} N={N:6d}: {us:7.1f} us "
                      f"({K*N/2/us/1e3:4.0f} GB/s int4)", flush=True)
            except Exception as e:
                print(f"  M-{mode:4s} K={K:6d} N={N:6d}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)

if __name__ == "__main__":
    main()
