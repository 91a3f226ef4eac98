"""Round-4: lm_head ragged-tn probe. N=32000/128256 (llama2/llama3
vocabs) are not 512-divisible, so the fused matvec dropped to tn=256
(~654 GB/s, PERF_NOTES). A ceil-division grid with a masked boundary
tile lets tn=512 serve them. Measures both tile sizes + checks numerics
vs the XLA dequant reference, then the full-model effect.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from neural_compressor_tpu.kernels import fused_matvec as fm
from neural_compressor_tpu.ops.packing import pack_qtensor, to_u4_kpack
from neural_compressor_tpu.ops.qtensor import quantize_tensor

ITERS = 2000


def bench_one(K, N, label):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32) * 0.02
    q = quantize_tensor(w, bits=4, group_size=128, scheme="sym")
    pw = to_u4_kpack(pack_qtensor(q))
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

    @jax.jit
    def chain(x, iters):
        def body(i, x):
            y = fm.fused_matvec(x, pw, out_dtype=jnp.bfloat16)
            return x * 0 + y[0, :K][None, :] * 1e-6 + x
        return jax.lax.fori_loop(0, iters, body, x)

    ref = None
    for ragged in (False, True):
        fm.set_ragged_tn(ragged)
        y = fm.fused_matvec(x, pw, out_dtype=jnp.float32)
        ynp = np.asarray(y)
        if ref is None:
            ref = ynp
        else:
            d = np.abs(ynp - ref).max() / max(np.abs(ref).max(), 1e-9)
            print(f"{label} ragged-vs-256 max-rel {d:.2e}", flush=True)
        out = chain(x, 10)
        _ = np.asarray(out)
        t0 = time.time()
        out = chain(x, ITERS)
        _ = np.asarray(out)
        dt = (time.time() - t0) / ITERS
        bytes_ = K * N // 2 + (K // 128) * N * 4
        print(f"{label} ragged={int(ragged)}: {dt*1e6:8.1f} us "
              f"{bytes_/dt/1e9:6.1f} GB/s", flush=True)
    fm.set_ragged_tn(True)


def main():
    print("device:", jax.devices(), flush=True)
    bench_one(4096, 32000, "llama2 head [4096x32000]")
    bench_one(4096, 128256, "llama3 head [4096x128256]")


if __name__ == "__main__":
    main()
