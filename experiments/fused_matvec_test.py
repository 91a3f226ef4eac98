"""Correctness + perf of kernels/fused_matvec on the real chip.

1. Numerics vs an f32 reference for every flag combo (rms / bias /
   residual / silu).
2. Perf: a chained llama2-7b decode-layer matmul sequence
   (qkv+norm -> o+res -> gateup+norm+silu -> down+res) — the per-layer
   matmul+glue cost the fused path replaces.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from neural_compressor_tpu.ops.packing import pack_qtensor, to_u4_kpack, \
    dequantize_packed
from neural_compressor_tpu.ops.qtensor import quantize_tensor
from neural_compressor_tpu.kernels.fused_matvec import fused_matvec

G = 128


def mk(K, N, seed=0):
    rng = np.random.default_rng(seed)
    kern = (rng.normal(size=(K, N)) * 0.05).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(kern), bits=4, group_size=G,
                         scheme="sym", dtype="int")
    pw = to_u4_kpack(pack_qtensor(qt))
    wref = np.asarray(dequantize_packed(pw, out_dtype=jnp.float32))
    return pw, wref


def ref_path(x, wref, rms_w=None, eps=1e-5, bias=None, residual=None,
             silu=False):
    xf = np.asarray(x, np.float32)
    if rms_w is not None:
        var = np.mean(xf * xf)
        z = xf * np.asarray(rms_w, np.float32) / np.sqrt(var + eps)
    else:
        z = xf
    s = np.abs(z).max() / 127.0
    s = 1.0 if s <= 0 else s
    q = np.clip(np.round(z / s), -128, 127)
    y = (q @ wref) * s
    if silu:
        g, u = np.split(y, 2, axis=-1)
        y = g / (1 + np.exp(-g)) * u
    if bias is not None:
        y = y + np.asarray(bias, np.float32)
    if residual is not None:
        y = y + np.asarray(residual, np.float32)
    return y


def correctness():
    K, N = 512, 1024
    pw, wref = mk(K, N)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, K)), jnp.bfloat16)
    rms_w = jnp.asarray(rng.uniform(0.5, 1.5, (K,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(1, N)), jnp.bfloat16)
    res_h = jnp.asarray(rng.normal(size=(1, N // 2)), jnp.bfloat16)
    cases = [
        ("plain", dict()),
        ("rms", dict(rms_w=rms_w, eps=1e-5)),
        ("bias", dict(bias=bias)),
        ("residual", dict(residual=res)),
        ("silu", dict(silu_gate=True)),
        ("rms+silu", dict(rms_w=rms_w, eps=1e-5, silu_gate=True)),
        ("rms+silu+res", dict(rms_w=rms_w, eps=1e-5, silu_gate=True,
                              residual=res_h)),
        ("res+bias", dict(residual=res, bias=bias)),
    ]
    for name, kw in cases:
        y = fused_matvec(x, pw, out_dtype=jnp.float32, **kw)
        assert y is not None, f"{name}: kernel declined"
        y = np.asarray(y)
        kw_np = dict(kw)
        r = ref_path(np.asarray(x, np.float32), wref,
                     rms_w=kw_np.get("rms_w"), eps=kw_np.get("eps", 1e-5),
                     bias=kw_np.get("bias"), residual=kw_np.get("residual"),
                     silu=kw_np.get("silu_gate", False))
        rel = np.linalg.norm(y - r) / max(np.linalg.norm(r), 1e-9)
        print(f"  {name:14s} rel={rel:.2e}", flush=True)
        assert rel < 2e-2, (name, rel)


def perf():
    H, I = 4096, 11008
    qkv, _ = mk(H, 3 * H, 2)
    o, _ = mk(H, H, 3)
    gu, _ = mk(H, 2 * I, 4)
    dn, _ = mk(I, H, 5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, H)), jnp.bfloat16)
    w1 = jnp.asarray(rng.uniform(0.8, 1.2, (H,)), jnp.float32)
    w2 = jnp.asarray(rng.uniform(0.8, 1.2, (H,)), jnp.float32)

    @jax.jit
    def layer_loop(x, n):
        def body(i, x):
            y = fused_matvec(x, qkv, rms_w=w1, eps=1e-5)      # [1, 3H]
            a = y[:, :H]                                       # stand-in attn
            x = fused_matvec(a, o, residual=x)
            h = fused_matvec(x, gu, rms_w=w2, eps=1e-5, silu_gate=True)
            x = fused_matvec(h, dn, residual=x)
            return x.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)

    r = layer_loop(x, 8)
    _ = np.asarray(r[0, 0])
    iters = 1000
    t0 = time.time()
    r = layer_loop(x, iters)
    _ = np.asarray(r[0, 0])
    dt = time.time() - t0
    us = dt / iters * 1e6
    by = (H * 3 * H + H * H + H * 2 * I + I * H) / 2
    print(f"  fused layer matmuls: {us:.1f} us/layer "
          f"({by / (dt / iters) / 1e9:.0f} GB/s weight stream; "
          f"32 layers -> {us * 32 / 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    print("correctness:", flush=True)
    correctness()
    print("perf:", flush=True)
    perf()
