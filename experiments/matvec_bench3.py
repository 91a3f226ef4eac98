"""Round 3: can the MXU and VPU work CONCURRENTLY on the M=1 matvec?

Measured so far: VPU-only int path ~41-46 us / 4096^2 int4 layer
(VPU-op-bound); dequant-into-MXU ~46 us (MXU-element-rate bound ~3.6e11
el/s). If Mosaic schedules MXU dots and VPU multiply-accumulates in
parallel within one kernel, splitting the N columns between the two units
should approach 1/(1/t_mxu + 1/t_vpu) ~ 22 us.

Variants:
  - w4a8_m1      : existing int8-MXU kernel at M=1 (true int8 MXU rate)
  - vpu_planes   : int path, per-plane accumulation (no big stacked temp)
  - hybrid[f]    : one kernel, fraction f of each N-tile through the MXU
                   (int8 group dots), rest through the VPU int path
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
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul

K = N = 4096
G = 128
P = 8
ITERS = 2000
BYTES_INT4 = K * N // 2 + (K // G) * N * 4


def build_weight(seed=0):
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (K, N), dtype=jnp.float32) * 0.02
    return pack_qtensor(quantize_int_sym(w, bits=4, group_size=G))


def quant_x(x):
    amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6)
    xs = (amax / 127.0).reshape(1)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int32)
    return xq, xs


def make_vpu_planes(pw, tk, tn):
    """int path, accumulating per nibble-plane (no [ngk,G,tn] temp)."""
    nk, nn = K // tk, N // tn
    ngk = tk // G
    rpg = G // P
    sc3 = pw.scales.astype(jnp.float32).reshape(nk, ngk, N)
    packed = pw.packed

    def kernel(x_ref, xs_ref, pk_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        c = pk_ref[:].reshape(ngk, rpg, tn)
        xq = x_ref[0]  # [ngk, P, rpg, 1] int32 (plane-major)
        a = jnp.zeros((ngk, tn), jnp.int32)
        for s in range(P):
            plane = (((c >> (4 * s)) & 15) ^ 8).astype(jnp.int32)
            a = a + jnp.sum(plane * xq[:, s], axis=1)
        b = jnp.sum(xq, axis=(1, 2))              # [ngk, 1]
        af = a.astype(jnp.float32) - 8.0 * b.astype(jnp.float32)
        acc_ref[0:1, :] += (jnp.sum(sc_ref[0] * af, axis=0)[None, :]
                            * xs_ref[0])

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[0:1, :]

    call = pl.pallas_call(
        kernel,
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((1, ngk, P, rpg, 1), lambda j, k: (k, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tk // P, tn), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ngk, tn), lambda j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )

    def step(x):
        xq, xs = quant_x(x)
        # plane-major x order: row of plane s, idx i = s*rpg + i
        x5 = xq.reshape(nk, ngk, P, rpg, 1)
        return call(x5, xs, packed, sc3)

    return step


def make_hybrid(pw, tk, tn, tn_mxu):
    """Each (j, k) step: columns [0, tn_mxu) via int8 MXU group-dots,
    columns [tn_mxu, tn) via the VPU int path — both from one packed tile.
    """
    nk, nn = K // tk, N // tn
    ngk = tk // G
    rpg = G // P
    sc3 = pw.scales.astype(jnp.float32).reshape(nk, ngk, N)
    packed = pw.packed
    tn_vpu = tn - tn_mxu

    def kernel(x_ref, xq8_ref, xs_ref, pk_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        c = pk_ref[:].reshape(ngk, rpg, tn)
        sc = sc_ref[0]
        xs = xs_ref[0]

        # --- MXU part: int8 codes x int8 activations, per group ---------
        cm = c[:, :, :tn_mxu]
        accm = jnp.zeros((1, tn_mxu), jnp.float32)
        xq8 = xq8_ref[0]  # [ngk*G padded to (ngk, G)] int8 rows? [ngk, G]
        for g in range(ngk):
            planes = [(((cm[g] >> (4 * s)) & 15) ^ 8) for s in range(P)]
            u = jnp.stack(planes, axis=0).reshape(G, tn_mxu)
            u8 = (u - 8).astype(jnp.int8)
            xg = xq8[g][None, :]  # [1, G] int8
            d = jax.lax.dot_general(
                xg, u8, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accm = accm + d.astype(jnp.float32) * sc[g, :tn_mxu][None, :]
        # --- VPU part ---------------------------------------------------
        cv = c[:, :, tn_mxu:]
        xq = x_ref[0]  # [ngk, P, rpg, 1] int32
        a = jnp.zeros((ngk, tn_vpu), jnp.int32)
        for s in range(P):
            plane = (((cv >> (4 * s)) & 15) ^ 8).astype(jnp.int32)
            a = a + jnp.sum(plane * xq[:, s], axis=1)
        b = jnp.sum(xq, axis=(1, 2))
        af = a.astype(jnp.float32) - 8.0 * b.astype(jnp.float32)
        accv = jnp.sum(sc[:, tn_mxu:] * af, axis=0)[None, :]

        acc_ref[0:1, :] += jnp.concatenate([accm, accv], axis=1) * xs

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[0:1, :]

    call = pl.pallas_call(
        kernel,
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((1, ngk, P, rpg, 1), lambda j, k: (k, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ngk, G), lambda j, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tk // P, tn), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ngk, tn), lambda j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )

    def step(x):
        xq, xs = quant_x(x)
        x5 = xq.reshape(nk, ngk, P, rpg, 1)
        # MXU x in ORIGINAL row order per group (int8)
        xq8 = xq.reshape(nk, ngk, G).astype(jnp.int8)
        # reorder to match unstacked plane order: row s*rpg+i of the group
        # equals original row s*(G/P)+i — identical layout, no reorder
        return call(x5, xq8, xs, packed, sc3)

    return step


def timeit(step, x0, label, bytes_per_call, iters=ITERS):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: step(v)[:, :K] * 0.25, x)

    try:
        t0 = time.time()
        r = run(x0, 2)
        _ = np.asarray(r.ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        r = run(x0, iters)
        _ = np.asarray(r.ravel()[0])
        dt = time.time() - t0
        us = dt / iters * 1e6
        gbs = bytes_per_call / (dt / iters) / 1e9
        print(f"{label:30s} {us:9.1f} us/call  {gbs:7.1f} GB/s  "
              f"(compile {compile_s:.1f}s)", flush=True)
    except Exception as e:
        print(f"{label:30s} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    print(f"device: {jax.devices()}", flush=True)
    pw = build_weight()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.float32) * 0.1

    def w4a8_step(x):
        return w4a8_matmul(x, pw, out_dtype=jnp.float32)

    timeit(w4a8_step, x0, "w4a8_mxu_m1", BYTES_INT4)

    for tk, tn in ((1024, 512), (2048, 512)):
        timeit(make_vpu_planes(pw, tk, tn), x0,
               f"vpu_planes tk{tk} tn{tn}", BYTES_INT4)

    # correctness check of hybrid before timing
    from neural_compressor_tpu.ops.packing import dequantize_packed
    ref = jnp.dot(x0, dequantize_packed(pw, out_dtype=jnp.float32))
    got = make_hybrid(pw, 1024, 512, 256)(x0)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"hybrid rel-err: {err:.2e}", flush=True)

    for tk, tn, tm in ((1024, 512, 128), (1024, 512, 256), (1024, 512, 384),
                       (2048, 512, 256)):
        timeit(make_hybrid(pw, tk, tn, tm), x0,
               f"hybrid tk{tk} tn{tn} mxu{tm}", BYTES_INT4)


if __name__ == "__main__":
    main()
