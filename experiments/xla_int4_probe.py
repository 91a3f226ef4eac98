"""XLA-native int4 dot probe (S4 arrays cannot cross jit boundaries under
the axon plugin -- convert inside one jit + optimization_barrier)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")

def timeit(make_run, K, N, iters, label, w8, x):
    run = make_run()
    _ = np.asarray(run(w8, x, 2).ravel()[0])
    t0 = time.time()
    _ = np.asarray(run(w8, x, iters).ravel()[0])
    us = (time.time() - t0) / iters * 1e6
    print(f"  {label:8s} K={K:6d} N={N:6d}: {us:7.1f} us "
          f"({K*N/2/us/1e3:4.0f} GB/s int4-equiv)", flush=True)

def main():
    print("device:", jax.devices(), flush=True)
    G = 128
    for K, N in ((4096, 12288), (4096, 22016), (11008, 4096)):
        rng = np.random.default_rng(0)
        w8 = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int8)
        sc = jnp.asarray(rng.standard_normal((K // G, N)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

        def mk_dot4():
            @jax.jit
            def run(w8, x, n):
                w4 = jax.lax.optimization_barrier(w8.astype(jnp.int4))
                def body(i, x):
                    xq = jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
                    y = jnp.dot(xq, w4, preferred_element_type=jnp.int32
                                ).astype(jnp.float32)
                    y = y[:, :K] if N >= K else jnp.tile(y, (1, K // N + 1))[:, :K]
                    return y.astype(jnp.bfloat16) * 1e-3
                return jax.lax.fori_loop(0, n, body, x)
            return run
        timeit(mk_dot4, K, N, 1000, "X-dot4", w8, x)

        def mk_gdot4():
            ngk = K // G
            @jax.jit
            def run(w8, x, n):
                w4 = jax.lax.optimization_barrier(
                    w8.reshape(ngk, G, N).astype(jnp.int4))
                def body(i, x):
                    xq = jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
                    xg = xq.reshape(ngk, 1, G)
                    d = jax.lax.dot_general(xg, w4,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                    y = jnp.sum(d[:, 0, :].astype(jnp.float32) * sc, axis=0)[None]
                    y = y[:, :K] if N >= K else jnp.tile(y, (1, K // N + 1))[:, :K]
                    return y.astype(jnp.bfloat16) * 1e-3
                return jax.lax.fori_loop(0, n, body, x)
            return run
        timeit(mk_gdot4, K, N, 1000, "X-gdot4", w8, x)

        def mk_dot8():
            @jax.jit
            def run(w8, x, n):
                def body(i, x):
                    xq = jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)
                    y = jnp.dot(xq, w8, preferred_element_type=jnp.int32
                                ).astype(jnp.float32)
                    y = y[:, :K] if N >= K else jnp.tile(y, (1, K // N + 1))[:, :K]
                    return y.astype(jnp.bfloat16) * 1e-3
                return jax.lax.fori_loop(0, n, body, x)
            return run
        timeit(mk_dot8, K, N, 1000, "X-dot8", w8, x)

if __name__ == "__main__":
    main()
