"""s4 kernel vs w4a8 (shift-plane) across M regimes on the fused shapes."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from neural_compressor_tpu.ops.qtensor import quantize_tensor
from neural_compressor_tpu.ops.packing import pack_qtensor, to_s4_rowpack
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
from neural_compressor_tpu.kernels.s4_matmul import s4_matmul
from neural_compressor_tpu.quantization.fuse import s4_prepare  # noqa

def bench(K, N, M, fn, pw, label, iters):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    @jax.jit
    def run(x, packed, n):
        pwl = pw._replace(packed=packed)
        if pwl.layout == "s4_rowpack":
            from neural_compressor_tpu.ops.packing import s4_view
            packed_v = jax.lax.optimization_barrier(s4_view(packed, K, N))
            pwl = pwl._replace(packed=packed_v)
        def body(i, x):
            y = fn(x, pwl)
            y = y[:, :K] if N >= K else jnp.tile(y, (1, K // N + 1))[:, :K]
            return y.astype(jnp.bfloat16) * 1e-3
        return jax.lax.fori_loop(0, n, body, x)
    _ = np.asarray(run(x, pw.packed, 2).ravel()[0])
    t0 = time.time()
    _ = np.asarray(run(x, pw.packed, iters).ravel()[0])
    us = (time.time() - t0) / iters * 1e6
    tfs = 2 * M * K * N / us / 1e6
    print(f"  {label:10s} K={K:6d} N={N:6d} M={M:5d}: {us:8.1f} us "
          f"({K*N/2/us/1e3:4.0f} GB/s, {tfs:6.1f} GF..TF/s)", flush=True)

def main():
    print("device:", jax.devices(), flush=True)
    G = 128
    for K, N in ((4096, 12288), (11008, 4096)):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=G, scheme="sym"))
        s4 = to_s4_rowpack(pw)
        for M, iters in ((16, 1000), (128, 500), (512, 200), (2048, 100)):
            bench(K, N, M, w4a8_matmul, pw, "w4a8", iters)
            bench(K, N, M, s4_matmul, s4, "s4", iters)

if __name__ == "__main__":
    main()
