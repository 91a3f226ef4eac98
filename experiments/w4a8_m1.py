"""Does the retiled w4a8 int8-MXU kernel beat the VPU matvec at M=1?
(B=16 full model now runs 12.0 ms/step vs 13.2 at B=1 — suspicious.)"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
from neural_compressor_tpu.ops.qtensor import quantize_tensor
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
from neural_compressor_tpu.kernels.dequant_matmul import vpu_matvec_int8act

def bench(K, N, fn, label, iters=2000):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=128, scheme="sym"))
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
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
    print(f"  {label:8s} K={K:6d} N={N:6d}: {us:7.1f} us ({K*N/2/us/1e3:4.0f} GB/s)",
          flush=True)

def main():
    print("device:", jax.devices(), flush=True)
    for K, N in ((4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)):
        bench(K, N, lambda x, pw: w4a8_matmul(x, pw), "w4a8")
        bench(K, N, lambda x, pw: vpu_matvec_int8act(x, pw), "vpu")

if __name__ == "__main__":
    main()
