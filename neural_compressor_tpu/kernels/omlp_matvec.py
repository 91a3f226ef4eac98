"""Decoder-block megakernel: o-projection + MLP in ONE pallas call.

Round-3 measured the B=1 decode at 5.7-5.8 ms/step with every
single-kernel lever at its local optimum; the residual ~1.2 ms over the
all-bytes roofline is per-kernel pipeline ramp across ~100 calls/step
(PERF_NOTES "Round 3"). This kernel removes two kernel boundaries per
layer (o -> gate_up -> down) by running all three projections as PHASES
of one sequential grid:

  phase O  (j in [0, n_o)):        x1 = o(attn_out) + residual, tile by
                                   tile into a VMEM scratch
  phase GU (j in [n_o, n_o+n_i)):  RMSNorm fold + act quant of x1 (first
                                   step), then h = silu(g)*u tiles,
                                   int8-quantized per tile into scratch
  phase D  (j >= n_o+n_i):         x2 = down(h) + x1, streamed out

The BlockSpec index maps CLAMP each operand to its live phase, so Mosaic's
block pipeline prefetches the NEXT phase's first weight tile while the
current phase computes — the weight stream never stalls at what used to
be a kernel boundary (cross-kernel software pipelining). Dynamic scratch
indexing stays on untiled leading dims (3-D scratches) which Mosaic
supports cheaply; lane offsets are always static.

Numerics vs the split kernels (kernels/fused_matvec.py): identical group
math; x1 is carried in f32 scratch instead of a bf16 round-trip, and the
hidden activation h is quantized per tn_i-tile (finer than the split
path's per-token scale), so results differ at the bf16-rounding level.

Reference counterpart: none — the reference delegates serving to external
stacks (neural_compressor/torch/.../modules.py:751); this is our serving
runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.packing import PackedWeight, resolve_double_quant
from .fused_matvec import _on_tpu, _pick_tn

# A/B lever: use the o+MLP megakernel in LlamaDecoderLayer._fused_call.
# Round-4 measurement (experiments/omlp_ab.log): llama2-7b 171.5 vs 170.0
# tok/s (+0.9%), llama3-8b 160.3 vs 169.3 (-5.3%, the VMEM budget forces
# tn=256 o/down tiles there) — default OFF pending the tiled-weight-layout
# work (experiments/tiled_stream_probe.py).
OMLP_FUSED = False


def set_omlp_fused(on: bool) -> None:
    global OMLP_FUSED
    OMLP_FUSED = bool(on)


def _make_kernel(*, Ko, Kh, I, Go, Gg, Gd, tn, tn_i, eps, has_o):
    n_o = Kh // tn if has_o else 0
    n_i = I // tn_i
    ngo = Ko // Go          # o-projection groups (whole-K weight tiles)
    ngg = Kh // Gg          # gate/up groups (whole-K weight tiles)
    gpt = tn_i // Gd        # down groups per intermediate tile

    def kernel(*refs):
        i = 0
        if has_o:
            x_ref = refs[i]; i += 1      # (1, Ko) attention output
            res_ref = refs[i]; i += 1    # (1, tn) layer input x, col j
            ow_ref = refs[i]; i += 1     # (Ko//8, tn) u32, col j
            osc_ref = refs[i]; i += 1    # (ngo, tn) f32, col j
        else:
            x_ref = refs[i]; i += 1      # (1, Kh) x1 (full)
            res_ref = refs[i]; i += 1    # (1, tn) x1 col-blocked (down res)
        rw_ref = refs[i]; i += 1         # (1, Kh) post-attn norm weight f32
        gw_ref = refs[i]; i += 1         # (Kh//8, tn_i) u32, col jj
        gsc_ref = refs[i]; i += 1        # (ngg, tn_i) f32
        uw_ref = refs[i]; i += 1         # (Kh//8, tn_i) u32, col jj + n_i
        usc_ref = refs[i]; i += 1
        dw_ref = refs[i]; i += 1         # (I//8, tn) u32, col jd
        dsc_ref = refs[i]; i += 1        # (I//Gd, tn) f32
        o_ref = refs[i]; i += 1          # (1, tn) out, col jd
        if has_o:
            xq_s = refs[i]; i += 1       # (8, Ko) int8: o-phase act codes
            ssc_s = refs[i]; i += 1      # SMEM (1,1): o-phase act scale
            xm_s = refs[i]; i += 1       # (n_o, 8, tn) f32: x1 tiles
        xq2_s = refs[i]; i += 1          # (8, Kh) int8: normed-x1 codes
        ssc2_s = refs[i]; i += 1         # SMEM (1,1): x1 act scale * 1/rms
        hq_s = refs[i]; i += 1           # (n_i, 8, tn_i) int8: h codes
        hsc_s = refs[i]; i += 1          # SMEM (n_i, 1): per-tile h scales

        j = pl.program_id(0)

        def gdot(xs, wref, scref, ng, Gx, lo=0):
            w4 = pltpu.bitcast(wref[:], jnp.int4)
            acc = None
            for g in range(ng):
                wg = w4[g * Gx:(g + 1) * Gx, :].astype(jnp.int8)
                xg = xs[:, lo + g * Gx:lo + (g + 1) * Gx]
                d = jax.lax.dot_general(
                    xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                t = d.astype(jnp.float32) * scref[g, :][None, :]
                acc = t if acc is None else acc + t
            return acc  # [8, tile] f32

        if has_o:
            @pl.when(j == 0)
            def _o_prologue():
                xf = x_ref[:].astype(jnp.float32)
                s = jnp.max(jnp.abs(xf)) / 127.0
                s = jnp.where(s <= 0, 1.0, s)
                codes = jnp.clip(jnp.round(xf / s), -128, 127
                                 ).astype(jnp.int8)
                xq_s[:] = jnp.broadcast_to(codes, xq_s.shape)
                ssc_s[0, 0] = s

            @pl.when(j < n_o)
            def _o_phase():
                acc = gdot(xq_s, ow_ref, osc_ref, ngo, Go)
                y = acc * ssc_s[0, 0] + res_ref[:].astype(jnp.float32)
                xm_s[j] = y  # rows identical; row 0 is the value

        @pl.when(j == n_o)
        def _gu_prologue():
            # RMSNorm folded by scale invariance of sym int8 act quant:
            # quantize z = x1 * w_norm, carry s * 1/rms as the act scale
            if has_o:
                sq = jnp.float32(0.0)
                for t in range(n_o):
                    xt = xm_s[t, 0:1]                     # (1, tn) f32
                    sq = sq + jnp.sum(xt * xt)
                inv = jax.lax.rsqrt(sq / Kh + eps)
                amax = jnp.float32(0.0)
                for t in range(n_o):
                    z = xm_s[t, 0:1] * rw_ref[:, t * tn:(t + 1) * tn]
                    amax = jnp.maximum(amax, jnp.max(jnp.abs(z)))
                s = amax / 127.0
                s = jnp.where(s <= 0, 1.0, s)
                for t in range(n_o):
                    z = xm_s[t, 0:1] * rw_ref[:, t * tn:(t + 1) * tn]
                    codes = jnp.clip(jnp.round(z / s), -128, 127
                                     ).astype(jnp.int8)
                    xq2_s[:, t * tn:(t + 1) * tn] = jnp.broadcast_to(
                        codes, (8, tn))
                ssc2_s[0, 0] = s * inv
            else:
                xf = x_ref[:].astype(jnp.float32)
                inv = jax.lax.rsqrt(jnp.mean(xf * xf) + eps)
                z = xf * rw_ref[:]
                s = jnp.max(jnp.abs(z)) / 127.0
                s = jnp.where(s <= 0, 1.0, s)
                codes = jnp.clip(jnp.round(z / s), -128, 127
                                 ).astype(jnp.int8)
                xq2_s[:] = jnp.broadcast_to(codes, xq2_s.shape)
                ssc2_s[0, 0] = s * inv

        @pl.when((j >= n_o) & (j < n_o + n_i))
        def _gu_phase():
            jj = j - n_o
            ssc2 = ssc2_s[0, 0]
            gacc = gdot(xq2_s, gw_ref, gsc_ref, ngg, Gg) * ssc2
            uacc = gdot(xq2_s, uw_ref, usc_ref, ngg, Gg) * ssc2
            h = gacc * jax.lax.logistic(gacc) * uacc      # (8, tn_i)
            hs = jnp.max(jnp.abs(h[0:1])) / 127.0
            hs = jnp.where(hs <= 0, 1.0, hs)
            hq_s[jj] = jnp.clip(jnp.round(h / hs), -128, 127
                                ).astype(jnp.int8)
            hsc_s[jj, 0] = hs

        @pl.when(j >= n_o + n_i)
        def _d_phase():
            jd = j - n_o - n_i
            w4 = pltpu.bitcast(dw_ref[:], jnp.int4)       # (I, tn)
            acc = None
            for t in range(n_i):
                hsc = hsc_s[t, 0]
                for g in range(gpt):
                    r = t * gpt + g
                    wg = w4[r * Gd:(r + 1) * Gd, :].astype(jnp.int8)
                    xg = hq_s[t, :, g * Gd:(g + 1) * Gd]
                    d = jax.lax.dot_general(
                        xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    tt = d.astype(jnp.float32) * (dsc_ref[r, :] * hsc)[None, :]
                    acc = tt if acc is None else acc + tt
            if has_o:
                res = xm_s[jd, 0:1]
            else:
                res = res_ref[:].astype(jnp.float32)
            o_ref[:] = (acc[0:1] + res).astype(o_ref.dtype)

    return kernel


def _clamp(v, lo, hi):
    return jnp.minimum(jnp.maximum(v, lo), hi)


@functools.partial(jax.jit, static_argnames=(
    "Ko", "Kh", "I", "Go", "Gg", "Gd", "tn", "tn_i", "eps", "has_o",
    "out_dtype"))
def _omlp_impl(x, residual, rms_w, ow, osc, guw, gusc, dw, dsc, *,
               Ko, Kh, I, Go, Gg, Gd, tn, tn_i, eps, has_o, out_dtype):
    n_o = Kh // tn if has_o else 0
    n_i = I // tn_i
    n_d = Kh // tn
    grid = n_o + n_i + n_d
    kernel = _make_kernel(Ko=Ko, Kh=Kh, I=I, Go=Go, Gg=Gg, Gd=Gd, tn=tn,
                          tn_i=tn_i, eps=eps, has_o=has_o)
    vmem = lambda shape, imap: pl.BlockSpec(shape, imap,
                                            memory_space=pltpu.VMEM)
    full = lambda shape: vmem(shape, lambda j: (0,) * len(shape))
    o_col = lambda shape: vmem(shape, lambda j: (0, _clamp(j, 0, n_o - 1)))
    g_col = lambda shape: vmem(
        shape, lambda j: (0, _clamp(j - n_o, 0, n_i - 1)))
    u_col = lambda shape: vmem(
        shape, lambda j: (0, _clamp(j - n_o, 0, n_i - 1) + n_i))
    d_col = lambda shape: vmem(
        shape, lambda j: (0, _clamp(j - n_o - n_i, 0, n_d - 1)))

    in_specs = []
    args = []
    if has_o:
        in_specs += [full((1, Ko)), o_col((1, tn)),
                     o_col((Ko // 8, tn)), o_col((Ko // Go, tn))]
        args += [x, residual, ow, osc]
    else:
        in_specs += [full((1, Kh)), d_col((1, tn))]
        args += [x, x]
    in_specs += [full((1, Kh)),
                 g_col((Kh // 8, tn_i)), g_col((Kh // Gg, tn_i)),
                 u_col((Kh // 8, tn_i)), u_col((Kh // Gg, tn_i)),
                 d_col((I // 8, tn)), d_col((I // Gd, tn))]
    args += [rms_w.reshape(1, Kh).astype(jnp.float32),
             guw, gusc, guw, gusc, dw, dsc]
    scratch = []
    if has_o:
        scratch += [pltpu.VMEM((8, Ko), jnp.int8),
                    pltpu.SMEM((1, 1), jnp.float32),
                    pltpu.VMEM((n_o, 8, tn), jnp.float32)]
    scratch += [pltpu.VMEM((8, Kh), jnp.int8),
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.VMEM((n_i, 8, tn_i), jnp.int8),
                pltpu.SMEM((n_i, 1), jnp.float32)]
    w_bytes = (Ko * Kh // 2 if has_o else 0) + Kh * I + I * Kh // 2
    sc_bytes = 4 * ((Ko // Go) * Kh if has_o else 0) + \
        4 * (Kh // Gg) * 2 * I + 4 * (I // Gd) * Kh
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=d_col((1, tn)),
        out_shape=jax.ShapeDtypeStruct((1, Kh), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Kh * (Ko if has_o else 0) + 2 * 2 * Kh * I
            + 2 * I * Kh,
            bytes_accessed=w_bytes + sc_bytes + Kh * 2,
            transcendentals=I),
    )(*args)


def _eligible(pw: PackedWeight) -> bool:
    K, N = pw.orig_shape
    G = pw.group_size if pw.group_size > 0 else K
    return (pw.layout == "u4_kpack" and pw.bits == 4 and pw.dtype == "int"
            and pw.zeros is None and pw.perm is None
            and K % 8 == 0 and K % G == 0 and G % 128 == 0)


def _pick_tiles(Kh: int, I: int, has_o: bool, Ko: int):
    """Largest hidden/intermediate tiles whose double-buffered blocks fit
    a conservative VMEM budget (the 16 MB scoped-vmem limit minus
    scratches and slack)."""
    tn_i = _pick_tn(I)
    if not tn_i:
        return 0, 0
    for tn in (512, 256, 128):
        if Kh % tn:
            continue
        blocks = 2 * (I // 8) * tn * 4            # down u32, double-buffered
        blocks += 4 * (Kh // 8) * tn_i * 4        # gate+up u32
        if has_o:
            blocks += 2 * (Ko // 8) * tn * 4      # o u32
        # f32 scales (same tiling, /8 of the u32 rows at G=128)
        blocks += blocks // 8
        scratch = (I // tn_i) * 8 * tn_i + 2 * 8 * max(Kh, Ko) \
            + (Kh // tn) * 8 * tn * 4
        if blocks + scratch < 11 * 1024 * 1024:
            return tn, tn_i
    return 0, 0


def mlp_fused(x1, pw_gu: PackedWeight, pw_down: PackedWeight, *, rms_w,
              eps: float, out_dtype=None):
    """x2 = x1 + down( silu(g)*u ) of z = act-quant(rmsnorm-fold(x1)) in
    one pallas call (M == 1). Returns None outside the fused envelope."""
    return _omlp(None, None, None, pw_gu, pw_down, x1=x1, rms_w=rms_w,
                 eps=eps, out_dtype=out_dtype)


def omlp_fused(attn_out, pw_o: PackedWeight, pw_gu: PackedWeight,
               pw_down: PackedWeight, *, residual, rms_w, eps: float,
               out_dtype=None):
    """x2 = x1 + down(silu(g)*u of rmsnorm-fold(x1)), x1 = residual +
    o(attn_out) — the whole post-attention half of a decoder layer in one
    pallas call (M == 1). Returns None outside the fused envelope."""
    return _omlp(attn_out, pw_o, residual, pw_gu, pw_down, x1=None,
                 rms_w=rms_w, eps=eps, out_dtype=out_dtype)


def _omlp(attn_out, pw_o, residual, pw_gu, pw_down, *, x1, rms_w, eps,
          out_dtype):
    has_o = attn_out is not None
    x = attn_out if has_o else x1
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    if any(d != 1 for d in lead) or not _on_tpu():
        return None
    pw_gu = resolve_double_quant(pw_gu)
    pw_down = resolve_double_quant(pw_down)
    Kh, N2 = pw_gu.orig_shape
    I, Nd = pw_down.orig_shape
    if N2 != 2 * I or Nd != Kh:
        return None
    if not (_eligible(pw_gu) and _eligible(pw_down)):
        return None
    if has_o:
        pw_o = resolve_double_quant(pw_o)
        Ko, No = pw_o.orig_shape
        if No != Kh or not _eligible(pw_o):
            return None
    else:
        Ko = Kh
    tn, tn_i = _pick_tiles(Kh, I, has_o, Ko)
    if not tn:
        return None
    Gg = pw_gu.group_size if pw_gu.group_size > 0 else Kh
    Gd = pw_down.group_size if pw_down.group_size > 0 else I
    if tn_i % Gd:
        return None
    Go = Gg
    if has_o:
        Go = pw_o.group_size if pw_o.group_size > 0 else Ko
    y = _omlp_impl(
        x.reshape(1, -1),
        (residual.reshape(1, Kh) if has_o else x1.reshape(1, Kh)),
        rms_w,
        pw_o.packed if has_o else jnp.zeros((1, 1), jnp.uint32),
        (pw_o.scales.astype(jnp.float32) if has_o
         else jnp.zeros((1, 1), jnp.float32)),
        pw_gu.packed, pw_gu.scales.astype(jnp.float32),
        pw_down.packed, pw_down.scales.astype(jnp.float32),
        Ko=Ko, Kh=Kh, I=I, Go=Go, Gg=Gg, Gd=Gd, tn=tn, tn_i=tn_i,
        eps=float(eps), has_o=has_o, out_dtype=jnp.dtype(out_dtype))
    return y.reshape(*lead, Kh)
