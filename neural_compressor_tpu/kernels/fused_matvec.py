"""Fused W4A8 decode matvec on "u4_kpack" uint32 weights.

The round-3 answer to the B=1 decode glue problem (VERDICT r2 #1). One
pallas call per projection subsumes what used to be 4-6 XLA ops around
each matmul:

  * in-kernel int4 unpack via ``pltpu.bitcast`` (u32 [K/8, tn] tile ->
    int4 [K, tn]): NO XLA-level int4 array exists, so there is no
    zero-copy view for XLA to re-materialize inside the decode loop
    (the s4_rowpack view + layout copy cost ~0.7 ms/step in the round-3
    profile) and the u32 buffer shards under TP shard_map like any array.
  * RMSNorm prologue by scale invariance: per-token symmetric int8
    quantization satisfies codes(x*w/rms) == codes(x*w), so the kernel
    quantizes z = x * norm_w and multiplies the activation scale by
    1/rms — the normalized activation is never materialized and the
    norm weight streams as a kernel operand (the separate f32[4096]
    norm-weight copies were ~0.65 ms/step of queued DMA in the profile).
  * epilogues: activation-scale multiply, bias, residual add, and
    silu(gate)*up for the fused gate_up projection — all applied to the
    [1, tn] accumulator in VMEM before one bf16 store.

Decode shapes allow tk == K (whole-K weight tiles fit VMEM), so the grid
is 1-D over N tiles and the quantized activation is computed once into
scratch at the first grid step (TPU grids execute sequentially).

Reference counterpart: none — the reference delegates serving to external
stacks (HPU fused ops, modules.py:751); this is our serving runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.packing import PackedWeight, dequantize_packed, resolve_double_quant


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


_PIN_OPERANDS = False  # pin weights/scales to HBM (defeat MSA pre-staging)


def set_pin_operands(pin: bool) -> None:
    """A/B lever: pin the fused-matvec weight/scale operands to HBM so
    XLA's memory-space assignment cannot pre-stage them into VMEM (the
    round-3 llama3 profile showed 764 us/step of latency-bound f32-scale
    copies); Mosaic's blocked pipeline streams them instead."""
    global _PIN_OPERANDS
    _PIN_OPERANDS = bool(pin)


def _make_kernel(*, K, G, eps, has_rms, has_bias, has_res, silu, nn,
                 sc_in_w=False):
    ngk = K // G

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        rw_ref = None
        if has_rms:
            rw_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1
        if sc_in_w:
            sc_ref = w_ref  # scales ride as u32 rows below the weight
        else:
            sc_ref = refs[i]; i += 1
        w2_ref = sc2_ref = None
        if silu:
            w2_ref = refs[i]; i += 1
            if sc_in_w:
                sc2_ref = w2_ref
            else:
                sc2_ref = refs[i]; i += 1
        bias_ref = None
        if has_bias:
            bias_ref = refs[i]; i += 1
        res_ref = None
        if has_res:
            res_ref = refs[i]; i += 1
        o_ref = refs[i]; i += 1
        xq_s = refs[i]; i += 1
        ssc_s = refs[i]; i += 1

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _prologue():
            xf = x_ref[:].astype(jnp.float32)            # [1, K]
            if has_rms:
                var = jnp.mean(xf * xf)
                inv = jax.lax.rsqrt(var + eps)
                z = xf * rw_ref[:]
            else:
                inv = jnp.float32(1.0)
                z = xf
            amax = jnp.max(jnp.abs(z))
            s = amax / 127.0
            s = jnp.where(s <= 0, 1.0, s)
            codes = jnp.clip(jnp.round(z / s), -128, 127).astype(jnp.int8)
            xq_s[:] = jnp.broadcast_to(codes, xq_s.shape)  # [8, K]
            ssc_s[0, 0] = s * inv

        def grouped_dot(wref, scref):
            if sc_in_w:
                w4 = pltpu.bitcast(wref[: K // 8, :], jnp.int4)  # [K, tn]
                sc = pltpu.bitcast(wref[K // 8:, :], jnp.float32)
            else:
                w4 = pltpu.bitcast(wref[:], jnp.int4)     # [K, tn]
                sc = scref[:]
            acc = None
            for g in range(ngk):
                wg = w4[g * G:(g + 1) * G, :].astype(jnp.int8)
                xg = xq_s[:, g * G:(g + 1) * G]
                d = jax.lax.dot_general(
                    xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                t = d.astype(jnp.float32) * sc[g, :][None, :]
                acc = t if acc is None else acc + t
            return acc                                    # [8, tn] f32

        ssc = ssc_s[0, 0]
        if silu:
            gacc = grouped_dot(w_ref, sc_ref) * ssc
            uacc = grouped_dot(w2_ref, sc2_ref) * ssc
            y = gacc * jax.lax.logistic(gacc) * uacc
        else:
            y = grouped_dot(w_ref, sc_ref) * ssc
        y = y[0:1]                                        # [1, tn]
        if has_bias:
            y = y + bias_ref[:]
        if has_res:
            y = y + res_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "K", "N", "G", "tn", "eps", "silu", "out_dtype", "pin", "sc_in_w"))
def _fused_impl(x, rms_w, w32, scales, bias, residual, *, K, N, G, tn, eps,
                silu, out_dtype, pin=False, sc_in_w=False):
    if pin:
        w32 = pltpu.with_memory_space_constraint(w32, pltpu.HBM)
        if scales is not None:
            scales = pltpu.with_memory_space_constraint(scales, pltpu.HBM)
    n_out = (N // 2) if silu else N
    # ceil-division grid: Mosaic masks the boundary block's stores, so a
    # ragged last N-tile is fine for the plain-matvec form (lm_head's
    # 32000/128256 vocab is not 512-divisible; tn=512 streams ~10% faster
    # than 256 on those shapes). Ragged mode is only selected by
    # fused_matvec for the epilogue-free case.
    nn = -(-n_out // tn)
    kernel = _make_kernel(K=K, G=G, eps=eps, has_rms=rms_w is not None,
                          has_bias=bias is not None,
                          has_res=residual is not None, silu=silu, nn=nn,
                          sc_in_w=sc_in_w)
    full = lambda shape: pl.BlockSpec(shape, lambda j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    col = lambda shape: pl.BlockSpec(shape, lambda j: (0, j),
                                     memory_space=pltpu.VMEM)
    col2 = lambda shape: pl.BlockSpec(shape, lambda j: (0, j + nn),
                                      memory_space=pltpu.VMEM)
    w_rows = K // 8 + (-(-(K // G) // 8) * 8 if sc_in_w else 0)
    in_specs = [full((1, K))]
    args = [x]
    if rms_w is not None:
        in_specs.append(full((1, K)))
        args.append(rms_w.reshape(1, K).astype(jnp.float32))
    in_specs.append(col((w_rows, tn)))
    args.append(w32)
    if not sc_in_w:
        in_specs.append(col((K // G, tn)))
        args.append(scales)
    if silu:
        in_specs.append(col2((w_rows, tn)))
        args.append(w32)
        if not sc_in_w:
            in_specs.append(col2((K // G, tn)))
            args.append(scales)
    if bias is not None:
        in_specs.append(col((1, tn)))
        args.append(bias.reshape(1, -1).astype(jnp.float32))
    if residual is not None:
        in_specs.append(col((1, tn)))
        args.append(residual.reshape(1, -1))
    return pl.pallas_call(
        kernel,
        grid=(nn,),
        in_specs=in_specs,
        out_specs=col((1, tn)),
        out_shape=jax.ShapeDtypeStruct((1, n_out), out_dtype),
        scratch_shapes=[pltpu.VMEM((8, K), jnp.int8),
                        pltpu.SMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_out * K * (2 if silu else 1),
            bytes_accessed=K * N // 2 + (K // G) * N * 4 + n_out * 2,
            transcendentals=0),
    )(*args)


def fused_ok(pw: PackedWeight, n_batch_tokens: int = 1) -> bool:
    """The fused kernel serves single-row decode on sym-int4 "u4_kpack"
    (or "u4_kpack_sc" — scales appended to the weight buffer) weights
    with 128-multiple groups and 256-multiple N."""
    K, N = pw.orig_shape
    G = pw.group_size if pw.group_size > 0 else K
    return (pw.layout in ("u4_kpack", "u4_kpack_sc") and pw.bits == 4
            and pw.dtype == "int"
            and pw.zeros is None and pw.perm is None
            and n_batch_tokens == 1 and K % 8 == 0 and K % G == 0
            and G % 128 == 0 and N % 128 == 0 and _on_tpu())


# ragged-N lever: let big epilogue-free matvecs (the lm_head) take
# tn=512 with a masked boundary tile instead of dropping to 256
RAGGED_TN = True


def set_ragged_tn(on: bool) -> None:
    global RAGGED_TN
    RAGGED_TN = bool(on)


def _pick_tn(n_out: int, allow_ragged: bool = False) -> int:
    for tn in (512, 256, 128):
        if n_out % tn == 0:
            return tn
    if allow_ragged and RAGGED_TN and n_out > 8192 and n_out % 128 == 0:
        return 512
    return 0


def fused_matvec(x: jax.Array, pw: PackedWeight, *, rms_w=None,
                 eps: float = 0.0, bias=None, residual=None,
                 silu_gate: bool = False, out_dtype=None):
    """y = [rms-norm ->] act-quant -> x @ dequant(Wq) [-> silu(g)*u]
    [+ bias] [+ residual], all in one pallas call (M == 1 only).

    Returns None when the weight/shape is outside the fused envelope —
    callers fall back to the modular path."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K, N = pw.orig_shape
    M = 1
    for d in lead:
        M *= d
    if not fused_ok(pw, M):
        return None
    if silu_gate and bias is not None:
        # the epilogue applies bias AFTER silu(g)*u, which is NOT the
        # gate_up bias semantics (silu(g+b_g)*(u+b_u)) — fall back to the
        # modular path rather than silently computing the wrong thing
        return None
    pw = resolve_double_quant(pw)
    n_out = (N // 2) if silu_gate else N
    # ragged tn needs masked boundary stores only on the OUTPUT — keep
    # the column-blocked epilogue operands (bias/residual/silu pair) on
    # exactly-dividing grids
    allow_ragged = (not silu_gate and bias is None and residual is None)
    tn = _pick_tn(n_out, allow_ragged=allow_ragged)
    if not tn:
        return None
    G = pw.group_size if pw.group_size > 0 else K
    sc_in_w = pw.layout == "u4_kpack_sc"
    y = _fused_impl(
        x.reshape(1, K), rms_w, pw.packed,
        None if sc_in_w else pw.scales.astype(jnp.float32),
        bias, residual if residual is None else residual.reshape(1, n_out),
        K=K, N=N, G=G, tn=tn, eps=float(eps), silu=silu_gate,
        out_dtype=jnp.dtype(out_dtype), pin=_PIN_OPERANDS, sc_in_w=sc_in_w)
    return y.reshape(*lead, n_out)


# ---------------------------------------------------------------------------
# Generic (any-M) u4_kpack matmul: same grid/tiling as kernels/s4_matmul
# but the weight tile arrives as u32 and unpacks in-kernel — used for
# prefill and batched decode on u4_kpack modules.
# ---------------------------------------------------------------------------


def _make_mk_kernel(G, ngk, nk):
    def kernel(xq_ref, w_ref, sc_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w4 = pltpu.bitcast(w_ref[:], jnp.int4)
        acc = acc_ref[:]
        for g in range(ngk):
            wg = w4[g * G:(g + 1) * G, :].astype(jnp.int8)
            xg = xq_ref[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32) * sc_ref[0, g]
        acc_ref[:] = acc

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("G", "K", "N", "tm", "tn", "tk"))
def _u4k_impl(xq, w32, scales, *, G, K, N, tm, tn, tk):
    M = xq.shape[0]
    nm, nn, nk = M // tm, N // tn, K // tk
    ngk = tk // G
    scales = scales.reshape(nk, ngk, N)
    return pl.pallas_call(
        _make_mk_kernel(G, ngk, nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 8, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ngk, tn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=xq.size + K * N // 2 + scales.size * 4
            + M * N * 4,
            transcendentals=0),
    )(xq, w32, scales)


def u4k_usable(pw: PackedWeight) -> bool:
    K, N = pw.orig_shape
    G = pw.group_size if pw.group_size > 0 else K
    return (pw.layout == "u4_kpack" and pw.bits == 4
            and pw.packed.dtype == jnp.uint32
            and pw.zeros is None and pw.dtype == "int"
            and K % 8 == 0 and K % G == 0 and G % 128 == 0
            and N % 128 == 0 and _on_tpu())


def u4k_matmul(x: jax.Array, pw: PackedWeight, out_dtype=None) -> jax.Array:
    """y = x @ dequant(Wq) with int8 per-token act quantization on
    "u4_kpack" weights (in-kernel quant at M == 1; XLA act quant + the
    tiled kernel otherwise). Falls back to the XLA dequant path off-TPU
    or for shapes the kernel does not tile."""
    from ..ops.qtensor import quantize_act_per_token
    from .w4a8_matmul import select_w4a8_tiles

    out_dtype = out_dtype or x.dtype
    pw = resolve_double_quant(pw)
    K, N = pw.orig_shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    if pw.perm is not None:
        x2 = jnp.take(x2, pw.perm, axis=1)
        pw = pw._replace(perm=None)
    M = x2.shape[0]
    if M == 1:
        y = fused_matvec(x2, pw, out_dtype=out_dtype)
        if y is not None:
            return y.reshape(*lead, N)
    G = pw.group_size if pw.group_size > 0 else K
    tm, tk = select_w4a8_tiles(M, K, G)
    tn = (512 if (M <= 32 and N % 512 == 0)
          else 256 if N % 256 == 0 else 128)
    if not u4k_usable(pw) or K % tk or N % tn or (tk // G) * G != tk:
        w = dequantize_packed(pw, out_dtype=jnp.bfloat16)
        return jnp.dot(x2.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32
                       ).astype(out_dtype)[:M].reshape(*lead, N)
    xq, x_scale = quantize_act_per_token(x2, bits=8)
    Mp = ((M + tm - 1) // tm) * tm
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    y = _u4k_impl(xq, pw.packed, pw.scales.astype(jnp.float32),
                  G=G, K=K, N=N, tm=tm, tn=tn, tk=tk)
    y = y[:M] * x_scale
    return y.astype(out_dtype).reshape(*lead, N)


# ---------------------------------------------------------------------------
# attn+o megakernel: decode attention fused INTO the o-projection kernel.
# The per-head attention outputs never leave VMEM — each head's rows are
# int8-quantized straight into the activation scratch (lane offset
# (h·rep+r)·D, no relayout: the o-projection's quant groups are G=128=D),
# then the standard grouped int8-MXU dot + residual epilogue runs.
#
# A/B RESULT (round 3): numerically correct (3.9e-3/7.2e-3 max-rel vs the
# split path) but MEASURED SLOWER — llama3-8b 168.3 vs 171.5 tok/s (the
# in-prologue attention stalls grid step 0 while the split kernels let
# XLA overlap attention with the o-weight prefetch), and the 32-head MHA
# unroll (llama2) fails remote compilation. Default OFF via ATTN_O_FUSED;
# kept as the starting point for a future pipelined megakernel.

ATTN_O_FUSED = False


def _make_attn_o_kernel(*, Hkv, T, D, rep, rep_p, K, G, scale, nn):
    ngk = K // G

    def kernel(pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref, w_ref,
               sc_ref, res_ref, o_ref, xq_s, ssc_s, attn_s):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _prologue():
            pos = pos_ref[0, 0]
            row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (rep_p, T), 1)
            amax = jnp.float32(0.0)
            for h in range(Hkv):
                k = jnp.where(row == pos, kn_ref[h], kc_ref[h])
                v = jnp.where(row == pos, vn_ref[h], vc_ref[h])
                s = jax.lax.dot_general(
                    q_ref[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(t_idx <= pos, s, -1e30)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [rep_p, D] f32
                attn_s[h] = o
                amax = jnp.maximum(
                    amax, jnp.max(jnp.abs(o[:rep])))
            s8 = amax / 127.0
            s8 = jnp.where(s8 <= 0, 1.0, s8)
            for h in range(Hkv):
                o = attn_s[h]
                codes = jnp.clip(jnp.round(o[:rep] / s8),
                                 -128, 127).astype(jnp.int8)
                for r in range(rep):
                    off = (h * rep + r) * D
                    xq_s[:, off:off + D] = jnp.broadcast_to(
                        codes[r:r + 1], (8, D))
            ssc_s[0, 0] = s8

        w4 = pltpu.bitcast(w_ref[:], jnp.int4)            # [K, tn]
        acc = None
        for g in range(ngk):
            wg = w4[g * G:(g + 1) * G, :].astype(jnp.int8)
            xg = xq_s[:, g * G:(g + 1) * G]
            d = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t = d.astype(jnp.float32) * sc_ref[g, :][None, :]
            acc = t if acc is None else acc + t
        y = acc[0:1] * ssc_s[0, 0]                        # [1, tn]
        y = y + res_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("K", "N", "G", "tn", "rep",
                                             "out_dtype"))
def _attn_o_impl(pos, q, k_new, v_new, k_cache, v_cache, w32, scales,
                 residual, *, K, N, G, tn, rep, out_dtype):
    Hkv, T, D = k_cache.shape
    rep_p = rep if rep == 1 else -(-rep // 8) * 8
    if rep_p != rep:
        q = jnp.pad(q, ((0, 0), (0, rep_p - rep), (0, 0)))
    nn = N // tn
    kernel = _make_attn_o_kernel(Hkv=Hkv, T=T, D=D, rep=rep, rep_p=rep_p,
                                 K=K, G=G, scale=1.0 / (D ** 0.5), nn=nn)
    full = lambda shape: pl.BlockSpec(shape, lambda j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    col = lambda shape: pl.BlockSpec(shape, lambda j: (0, j),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # pos
            full((Hkv, rep_p, D)),                        # q (rope'd)
            full((Hkv, 1, D)),                            # k_new
            full((Hkv, 1, D)),                            # v_new
            full((Hkv, T, D)),                            # k cache
            full((Hkv, T, D)),                            # v cache
            col((K // 8, tn)),                            # o weights
            col((K // G, tn)),                            # o scales
            col((1, tn)),                                 # residual
        ],
        out_specs=col((1, tn)),
        out_shape=jax.ShapeDtypeStruct((1, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((8, K), jnp.int8),
                        pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.VMEM((Hkv, rep_p, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K + 4 * Hkv * rep * T * D,
            bytes_accessed=K * N // 2 + (K // G) * N * 4
            + 2 * Hkv * T * D * 2,
            transcendentals=Hkv * rep * T),
    )(jnp.asarray(pos, jnp.int32).reshape(1, 1), q, k_new, v_new,
      k_cache, v_cache, w32, scales, residual)


def attn_o_fused(q, k_new, v_new, cache, pos, pw_o: PackedWeight,
                 residual, out_dtype=None):
    """B=1 decode attention + o-projection in ONE pallas call.

    q [1, H, 1, D] (rope applied); k_new/v_new [1, Hkv, 1, D]; ``cache``
    a bf16 KVCache ([1, Hkv, T, D] tensors); pw_o the o-projection's
    sym-int4 "u4_kpack" weight; ``residual`` [1, 1, N]. Returns
    (y [1, 1, N], k2, v2) with the new row written OUTSIDE the kernel
    (XLA DUS, in-place under donation), or None when ineligible (callers
    fall back to the split attention-then-o path)."""
    from ..models.llama import KVCache, _update_rows

    if not isinstance(cache, tuple) or len(cache) != 2:
        return None
    k_cache, v_cache = cache
    B, H, S, D = q.shape
    if B != 1 or S != 1:
        return None
    pw_o = resolve_double_quant(pw_o)
    K, N = pw_o.orig_shape
    G = pw_o.group_size if pw_o.group_size > 0 else K
    Hkv = k_cache.shape[1]
    rep = H // Hkv
    if not (fused_ok(pw_o, 1) and pw_o.layout == "u4_kpack" and G == D
            and K == H * D and k_cache.dtype in (jnp.bfloat16, jnp.float32)
            and k_cache.dtype == q.dtype):
        return None
    tn = _pick_tn(N)
    if not tn:
        return None
    y = _attn_o_impl(
        pos, q[0].reshape(Hkv, rep, D), k_new[0], v_new[0],
        k_cache[0], v_cache[0], pw_o.packed,
        pw_o.scales.astype(jnp.float32), residual.reshape(1, N),
        K=K, N=N, G=G, tn=tn, rep=rep,
        out_dtype=jnp.dtype(out_dtype or q.dtype))
    k2 = _update_rows(k_cache, k_new, pos)
    v2 = _update_rows(v_cache, v_new, pos)
    return y.reshape(1, 1, N), KVCache(k2, v2)
