"""A/B: direct _w4a8_impl (sweep2's 198 TF/s recipe) vs public w4a8_matmul."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from neural_compressor_tpu.ops.qtensor import quantize_int_sym, quantize_act_per_token
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.kernels.w4a8_matmul import _w4a8_impl, w4a8_matmul

M, K, N, G = 2048, 4096, 4096, 128
FLOPS = 2 * M * K * N

def timeit(step, x0, label, iters=300):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: step(v), x)
    t0 = time.time(); r = run(x0, 2); _ = np.asarray(r.ravel()[0])
    c = time.time() - t0
    t0 = time.time(); r = run(x0, iters); _ = np.asarray(r.ravel()[0])
    dt = (time.time() - t0) / iters
    print(f"{label:28s} {dt*1e6:9.1f} us  {FLOPS/dt/1e12:7.1f} TF/s "
          f"(compile {c:.0f}s)", flush=True)

def main():
    print("device:", jax.devices(), flush=True)
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
    pw = pack_qtensor(quantize_int_sym(w, bits=4, group_size=G))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16) * 0.05

    def step_direct(x):
        xq, xs = quantize_act_per_token(x.reshape(-1, K), bits=8)
        y = _w4a8_impl(xq, pw.packed, pw.scales.astype(jnp.float32),
                       bits=4, G=G, K=K, N=N, interpret=False,
                       tm=1024, tn=256, tk=4096)
        return ((y * xs) * 0.02).astype(jnp.bfloat16)[:, :K]
    timeit(step_direct, x0, "direct tm1024 tn256 tk4096")

    def step_pub(x):
        return (w4a8_matmul(x, pw) * 0.02).astype(jnp.bfloat16)[:, :K]
    timeit(step_pub, x0, "public w4a8_matmul")

if __name__ == "__main__":
    main()
