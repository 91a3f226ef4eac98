"""A/B: u4k_matmul (in-kernel bitcast) vs w4a8_matmul (shift-plane
tpu_strided) at batched M — round-2 chose w4a8 for M>=16; does the
round-3 u4k layout change that?"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from neural_compressor_tpu.ops.qtensor import quantize_tensor
from neural_compressor_tpu.ops.packing import pack_qtensor, to_u4_kpack
from neural_compressor_tpu.kernels.fused_matvec import u4k_matmul
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul

ITERS = 500
rng = np.random.default_rng(0)
print("device:", jax.devices(), flush=True)
for K, N in ((4096, 12288), (4096, 22016), (11008, 4096)):
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    base = pack_qtensor(quantize_tensor(w, bits=4, group_size=128))
    pw_u4k = to_u4_kpack(base)
    for M in (16, 64, 128):
        row = []
        for label, fn, pw in (("w4a8", w4a8_matmul, base),
                              ("u4k", u4k_matmul, pw_u4k)):
            @functools.partial(jax.jit)
            def loop(x, steps=ITERS):
                def body(i, x):
                    y = fn(x, pw)
                    return x + (jnp.sum(y) * 1e-12).astype(x.dtype)
                return jax.lax.fori_loop(0, steps, body, x)
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            r = loop(x); _ = np.asarray(r[0, 0])
            t0 = time.time()
            r = loop(x); _ = np.asarray(r[0, 0])
            us = (time.time() - t0) / ITERS * 1e6
            row.append(f"{label}: {us:7.1f}us")
        print(f"K={K:5d} N={N:5d} M={M:3d}  " + "  ".join(row), flush=True)
