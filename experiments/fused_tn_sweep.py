"""Per-shape tn sweep for the fused u4_kpack matvec (llama3-8b decode
shapes + lm_head). Timing: chained fori_loop with a data dependency."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from neural_compressor_tpu.ops.qtensor import quantize_tensor
from neural_compressor_tpu.ops.packing import pack_qtensor, to_u4_kpack
from neural_compressor_tpu.kernels.fused_matvec import _fused_impl

SHAPES = [("lm_head", 4096, 128256, False)]
# qkv/o: tn512 best (415/347 GB/s); gate_up tn2048 + down tn1024 OOM scoped vmem
ITERS = 2000
rng = np.random.default_rng(0)
print("device:", jax.devices(), flush=True)
for label, K, N, silu in SHAPES:
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    pw = to_u4_kpack(pack_qtensor(quantize_tensor(w, bits=4, group_size=128)))
    sc = pw.scales.astype(jnp.float32)
    n_out = N // 2 if silu else N
    row = []
    for tn in (512, 1024):
        if n_out % tn:
            row.append(f"tn{tn}: --")
            continue
        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(x, w32, tn):
            def body(i, x):
                y = _fused_impl(x, None, w32, sc, None, None, K=K, N=N,
                                G=128, tn=tn, eps=0.0, silu=silu,
                                out_dtype=jnp.bfloat16)
                # data dependency: fold output back into the input
                return x + jnp.sum(y).astype(x.dtype) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, x)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
        r = loop(x, pw.packed, tn); _ = np.asarray(r[0, 0])
        t0 = time.time()
        r = loop(x, pw.packed, tn); _ = np.asarray(r[0, 0])
        us = (time.time() - t0) / ITERS * 1e6
        gbs = (K * N / 2 + K // 128 * N * 4) / us / 1e3
        row.append(f"tn{tn}: {us:6.1f}us {gbs:5.0f}GB/s")
    print(f"{label:8s} K={K:5d} N={N:6d} " + " | ".join(row), flush=True)
