"""w4a8 prefill tile sweep toward the raw int8 MXU rate (228 TF/s)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from neural_compressor_tpu.ops.qtensor import quantize_int_sym, quantize_act_per_token
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.kernels.w4a8_matmul import _w4a8_impl

M, K, N, G = 2048, 4096, 4096, 128
FLOPS = 2 * M * K * N

def timeit(step, x0, label, iters=300):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: step(v), x)
    try:
        t0 = time.time(); r = run(x0, 2); _ = np.asarray(r.ravel()[0])
        c = time.time() - t0
        t0 = time.time(); r = run(x0, iters); _ = np.asarray(r.ravel()[0])
        dt = time.time() - t0
        print(f"{label:28s} {dt/iters*1e6:9.1f} us  "
              f"{FLOPS/(dt/iters)/1e12:7.1f} TF/s (compile {c:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{label:28s} FAILED {type(e).__name__}: {str(e)[:70]}",
              flush=True)

def main():
    print("device:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    pw = pack_qtensor(quantize_int_sym(w, bits=4, group_size=G))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16) * 0.05

    for tm, tn, tk in ((1024, 512, 2048), (2048, 256, 2048),
                       (2048, 512, 1024), (1024, 256, 4096),
                       (2048, 256, 1024), (1024, 128, 2048)):
        def step(x, tm=tm, tn=tn, tk=tk):
            xq, xs = quantize_act_per_token(x.reshape(-1, K), bits=8)
            y = _w4a8_impl(xq, pw.packed, pw.scales.astype(jnp.float32),
                           bits=4, G=G, K=K, N=N, interpret=False,
                           tm=tm, tn=tn, tk=tk)
            return ((y * xs) * 0.02).astype(jnp.bfloat16)[:, :K]
        timeit(step, x0, f"w4a8 tm{tm} tn{tn} tk{tk}")

if __name__ == "__main__":
    main()
