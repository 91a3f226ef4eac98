"""M=1 dequant-matvec kernel design experiments (VERDICT round-2 item #1).

Measures, on the real chip, for a 4096x4096 int4 g128 sym layer:
  - hbm_probe_int4 : pure packed-read+reduce kernel -> achievable GB/s
  - hbm_probe_bf16 : same over a 33 MB bf16 array
  - xla_bf16       : XLA bf16 matvec (chained, data-dependent)
  - cur_pallas     : existing dequant-into-MXU kernel
  - mxu_m8         : existing kernel with M padded to 8 sublanes
  - vpu_elem[t k,tn] : VPU matvec, per-element dequant
  - vpu_grp[tk,tn]   : VPU matvec, group-factored scales (fewer ops/el)

Timing: chained fori_loop with a real data dependency (y feeds next x),
host read-back to sync (block_until_ready does not sync over the tunnel).
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from neural_compressor_tpu.ops.qtensor import quantize_int_sym
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.kernels.dequant_matmul import (
    dequant_matmul_pallas, _dequant_matmul_impl)

K = N = 4096
G = 128
P = 8  # int4 values per uint32
ITERS = 2000

BYTES_INT4 = K * N // 2 + (K // G) * N * 4  # packed + f32 scales
BYTES_BF16 = K * N * 2


def build_weight():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), dtype=jnp.float32) * 0.02
    qt = quantize_int_sym(w, bits=4, group_size=G)
    pw = pack_qtensor(qt)
    return w.astype(jnp.bfloat16), pw


# ---------------------------------------------------------------------------
# VPU matvec kernels
# ---------------------------------------------------------------------------

def _unpack_xor8(pk, ngk, rpg, tn):
    """uint32 [tkp, tn] -> f32 (signed+8) codes [ngk, G, tn] in row order."""
    c = pk.reshape(ngk, rpg, tn)
    planes = [(((c >> (4 * s)) & 15) ^ 8).astype(jnp.int32).astype(jnp.float32)
              for s in range(P)]
    return jnp.stack(planes, axis=1).reshape(ngk, P * rpg, tn)


def make_vpu_matvec(pw, tk, tn, mode):
    """y[1,N] = x @ deq(W): VPU-only (no MXU). mode in {"elem", "grp"}."""
    nk, nn = K // tk, N // tn
    ngk = tk // G
    rpg = G // P
    scales = pw.scales.astype(jnp.float32).reshape(nk, ngk, N)
    packed = pw.packed

    def kernel(x_ref, pk_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        codes8 = _unpack_xor8(pk_ref[:], ngk, rpg, tn)  # [ngk, G, tn] u+8
        xb = x_ref[0]                                   # [ngk, G, 1] f32
        sc = sc_ref[0]                                  # [ngk, tn]
        if mode == "elem":
            w = (codes8 - 8.0) * sc[:, None, :]
            part = jnp.sum(w * xb, axis=(0, 1))[None, :]
        else:  # grp: y = sum_g s_g*(A_g - 8*b_g), A_g = sum_k x_k*(u^8)
            a = jnp.sum(codes8 * xb, axis=1)            # [ngk, tn]
            b = jnp.sum(xb, axis=1)                     # [ngk, 1]
            part = jnp.sum(sc * (a - 8.0 * b), axis=0)[None, :]
        acc_ref[0:1, :] += part

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[0:1, :]

    x_spec = pl.BlockSpec((1, ngk, G, 1), lambda j, k: (k, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    pk_spec = pl.BlockSpec((tk // P, tn), lambda j, k: (k, j),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, ngk, tn), lambda j, k: (k, 0, j),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, tn), lambda j, k: (0, j),
                          memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(nn, nk),
        in_specs=[x_spec, pk_spec, sc_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N, bytes_accessed=BYTES_INT4 + K * 4 + N * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )

    def step(x):  # x: [1, K] f32
        x4 = x.reshape(nk, ngk, G, 1)
        y = call(x4, packed, scales)
        return y * 0.25

    return step


# ---------------------------------------------------------------------------
# HBM bandwidth probes
# ---------------------------------------------------------------------------

def make_hbm_probe(arr, rows_per_step):
    R, C = arr.shape
    nk = R // rows_per_step

    def kernel(s_ref, a_ref, o_ref, acc_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:]
        if a.dtype == jnp.uint32:
            a = a.astype(jnp.int32)
        acc_ref[:] += jnp.sum(a.astype(jnp.float32)) + s_ref[0]

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    call = pl.pallas_call(
        kernel,
        grid=(nk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows_per_step, C), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )

    def step(s):  # s: [1] f32 scalar carrier
        out = call(s, arr)
        return out[0, 0:1] * 1e-30

    return step


# ---------------------------------------------------------------------------
# Timing
# ---------------------------------------------------------------------------

def timeit(step, x0, label, bytes_per_call, iters=ITERS):
    @jax.jit
    def run(x, n):
        # n traced -> one compile covers warmup and the timed call
        return jax.lax.fori_loop(0, n, lambda i, v: step(v), x)

    try:
        t0 = time.time()
        r = run(x0, 2)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        r = run(x0, iters)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        dt = time.time() - t0
        us = dt / iters * 1e6
        gbs = bytes_per_call / (dt / iters) / 1e9
        print(f"{label:26s} {us:9.1f} us/call  {gbs:7.1f} GB/s  "
              f"(compile {compile_s:.1f}s)", flush=True)
        return us
    except Exception as e:
        print(f"{label:26s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None


def main():
    print(f"device: {jax.devices()}", flush=True)
    w_bf16, pw = build_weight()
    x0 = (jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.float32)
          * 0.1)
    s0 = jnp.zeros((1,), jnp.float32)

    # HBM probes
    timeit(make_hbm_probe(pw.packed, 32), s0, "hbm_probe_int4(8MB)",
           BYTES_INT4, iters=500)
    timeit(make_hbm_probe(w_bf16, 256), s0, "hbm_probe_bf16(33MB)",
           BYTES_BF16, iters=300)
    for rows in (64, 128):
        timeit(make_hbm_probe(pw.packed, rows), s0,
               f"hbm_probe_int4 r{rows}", BYTES_INT4, iters=500)

    # XLA bf16 matvec
    def xla_step(x):
        y = jnp.dot(x.astype(jnp.bfloat16), w_bf16,
                    preferred_element_type=jnp.float32)
        return y * 0.25

    timeit(xla_step, x0, "xla_bf16_dot", BYTES_BF16)

    # current pallas kernel (M=1 and M=8-padded)
    def cur_step(x):
        y = dequant_matmul_pallas(x.astype(jnp.bfloat16), pw,
                                  out_dtype=jnp.float32)
        return y * 0.25

    timeit(cur_step, x0, "cur_pallas_m1", BYTES_INT4)

    def m8_step(x):
        x8 = jnp.broadcast_to(x.astype(jnp.bfloat16), (8, K))
        y = _dequant_matmul_impl(
            x8, pw.packed, pw.scales.astype(jnp.float32), None,
            bits=4, group_size=G, dtype_name="int", layout="tpu_strided",
            K=K, N=N, has_zeros=False, out_dtype=jnp.float32,
            interpret=False, tm=8, tn=256, tk=1024)
        return y[0:1] * 0.25

    timeit(m8_step, x0, "mxu_m8 tk1024 tn256", BYTES_INT4)

    # VPU matvec variants
    for mode in ("grp", "elem"):
        for tk, tn in ((512, 256), (1024, 256), (512, 512), (256, 512),
                       (1024, 512), (2048, 128), (4096, 256)):
            if (K % tk) or (N % tn):
                continue
            step = make_vpu_matvec(pw, tk, tn, mode)
            timeit(step, x0, f"vpu_{mode} tk{tk} tn{tn}", BYTES_INT4)

    # correctness spot check of the best-variant math vs XLA dequant
    from neural_compressor_tpu.ops.packing import dequantize_packed
    ref = jnp.dot(x0, dequantize_packed(pw, out_dtype=jnp.float32))
    got = make_vpu_matvec(pw, 512, 256, "grp")(x0) / 0.25
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"vpu_grp correctness rel-err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
