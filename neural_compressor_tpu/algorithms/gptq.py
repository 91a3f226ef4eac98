"""GPTQ — Hessian-based weight-only quantization, jit-compiled.

Parity target: the reference's ``RAWGPTQuantizer``/``GPTQ``
(neural_compressor/torch/algorithms/weight_only/gptq.py): H = 2/n·X·Xᵀ
accumulation (:1111-1141), damped Cholesky inverse (:1221-1231), blocked
per-column error-feedback loop (:1250-1304), act_order (:1212),
static_groups (:1193), block-sequential calibration (:399-458, 568-860).

TPU redesign: no eager per-column Python loop — the column sweep is a
``lax.fori_loop`` nest (outer over 128-column panels, inner over columns)
compiled once per layer shape, with the panel kept in registers/VMEM by XLA.
Hessian accumulation is a jitted XᵀX per replayed batch. The whole algorithm
is O(K³) in the Cholesky plus O(K²·N) in the sweep, all on the MXU.

Convention note: our kernels store W as [K, N] (in×out); GPTQ math runs on
Wᵀ [N, K] with H [K, K] over the input dim, then transposes back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import logger
from ..layers.module_utils import get_module, named_modules, replace_module
from ..layers.observers import ObserverStat
from ..layers.woq_linear import WOQLinear
from ..ops.qtensor import (CODEBOOKS, FLOAT_CODE_DTYPES, QTensor,
                           _codebook_nearest, _grouped, quantize_with_scale)
from ..ops.packing import pack_qtensor
from . import register_algo
from .calib_capture import (
    CalibCaptureState,
    find_target_blocks,
    run_capture,
)
from .utils import extract_linear, dump_op_stats

_FLOAT_SKIP = ("fp32", "bf16", "fp16", "float32", "bfloat16", "float16")


# ---------------------------------------------------------------------------
# Hessian capture
# ---------------------------------------------------------------------------

@jax.jit
def _xtx_update(xtx, count, x):
    """One fused accumulate dispatch per replayed batch (eager per-op
    dispatch costs ~0.3 s in this environment)."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return xtx + x2.T @ x2, count + x2.shape[0]


class HessianObserver(nnx.Module):
    """Wraps a Linear-like module; accumulates X᙭ = Σ xᵀx and sample count
    over its inputs (reference ``add_batch``, gptq.py:1111-1141)."""

    def __init__(self, inner: nnx.Module, in_features: int,
                 n_in_dims: int = 1):
        self.inner = inner
        # LinearGeneral (MHA out-projection) contracts over several
        # trailing input axes — flatten them for the K x K Hessian
        self.n_in_dims = n_in_dims
        self.xtx = ObserverStat(jnp.zeros((in_features, in_features),
                                          dtype=jnp.float32))
        self.count = ObserverStat(jnp.array(0.0, dtype=jnp.float32))

    def __call__(self, x, *args, **kwargs):
        xf = x
        if self.n_in_dims > 1:
            xf = x.reshape(*x.shape[: x.ndim - self.n_in_dims], -1)
        self.xtx[...], self.count[...] = _xtx_update(
            self.xtx[...], self.count[...], xf)
        return self.inner(x, *args, **kwargs)

    def hessian(self) -> jax.Array:
        n = jnp.maximum(self.count[...], 1.0)
        return 2.0 * self.xtx[...] / n


# ---------------------------------------------------------------------------
# The core column-sweep quantizer
# ---------------------------------------------------------------------------

def _group_scale(wg: jax.Array, bits: int, sym: bool, codebook=None):
    """Per-row scale/zero for one group slab wg [N, G] (centered-asym
    convention, matching ops.qtensor)."""
    if codebook is not None:
        scale = jnp.max(jnp.abs(wg), axis=1)
        scale = jnp.where(scale <= 0, 1.0, scale)
        return scale, jnp.zeros_like(scale)
    qmax_s = 2 ** (bits - 1) - 1
    if sym:
        scale = jnp.max(jnp.abs(wg), axis=1) / qmax_s
        scale = jnp.where(scale <= 0, 1.0, scale)
        zero = jnp.zeros_like(scale)
    else:
        amax = jnp.max(wg, axis=1)
        amin = jnp.min(wg, axis=1)
        scale = (amax - amin) / (2**bits - 1)
        scale = jnp.where(scale <= 0, 1.0, scale)
        zero = jnp.round(-amin / scale) - 2 ** (bits - 1)
    return scale, zero


def _qdq_col(w: jax.Array, scale: jax.Array, zero: jax.Array, bits: int,
             sym: bool, codebook=None):
    """Quantize-dequantize one column w [N] with per-row scale/zero."""
    if codebook is not None:
        idx = _codebook_nearest(w / scale, codebook).astype(jnp.int32)
        return codebook[idx] * scale
    if sym:
        qmax = 2 ** (bits - 1) - 1
        q = jnp.clip(jnp.round(w / scale), -qmax - 1, qmax)
        return q * scale
    qmax = 2**bits - 1
    half = 2 ** (bits - 1)
    q = jnp.clip(jnp.round(w / scale) + (zero + half), 0, qmax) - half
    return (q - zero) * scale


def _tril_inverse_blocked(L: jax.Array, block: int = 256) -> jax.Array:
    """Invert a lower-triangular [K, K] matrix with bounded memory.

    Blocked forward substitution: each fori_loop step solves one B-row
    panel against the small [B, B] diagonal block, so no triangular_solve
    ever sees the full K extent (the XLA:TPU K-sized solve materializes
    O(K/128) panel temps — 20 GB at K=11008)."""
    K = L.shape[0]
    B = next(b for b in range(min(block, K), 0, -1) if K % b == 0)
    nb = K // B
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)[0]

    def step(p, M):
        r0 = p * B
        Lrow = jax.lax.dynamic_slice(L, (r0, 0), (B, K))
        Lb = jax.lax.dynamic_slice(L, (r0, r0), (B, B))
        E = (k_idx[None, :] == (r0 + jnp.arange(B))[:, None]).astype(L.dtype)
        X = Lrow @ M  # rows >= r0 of M are still zero
        Y = jax.lax.linalg.triangular_solve(Lb, E - X, left_side=True,
                                            lower=True)
        return jax.lax.dynamic_update_slice(M, Y, (r0, 0))

    return jax.lax.fori_loop(0, nb, step, jnp.zeros_like(L))


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "sym", "act_order", "percdamp",
                     "block_size", "static_groups", "hybrid_order",
                     "fp8_aware", "wdtype"),
)
def gptq_quantize_matrix(W: jax.Array, H: jax.Array, *, bits=4,
                         group_size=128, sym=True, act_order=False,
                         percdamp=0.01, block_size=128, static_groups=False,
                         hybrid_order=False, fp8_aware=False, wdtype="int"):
    """Run the GPTQ sweep on one weight.

    W: [K, N] (in × out). H: [K, K]. Returns (Wq [K, N] QDQ values,
    scales [K/G, N], zeros [K/G, N], perm [K] or None).

    ``hybrid_order`` (GAR, reference gptq.py:1203-1209 + 1389-1460): reorder
    columns by Hessian diagonal locally within each group and reorder whole
    groups globally — groups stay intact so inference needs only one input
    permutation (returned as ``perm``; Wq/scales stay in PERMUTED order).

    ``fp8_aware`` (reference gptq.py:1237-1248): snap QDQ values onto the
    fp8 e4m3 grid inside a protective range so a downstream W4A8/fp8 serving
    matmul cannot overflow when dequantizing int4 -> fp8. Returns values
    already multiplied back by the pow2 bf16->fp8 scale.

    ``wdtype`` "nf4"/"fp4" runs the sweep with codebook rounding (absmax
    group scale, nearest-codebook QDQ) instead of integer rounding, matching
    the reference's dtype support in its GPTQ ``quantize`` hook.
    """
    codebook = CODEBOOKS[wdtype] if wdtype in FLOAT_CODE_DTYPES else None
    K, N = W.shape
    G = group_size if group_size > 0 else K
    B = min(block_size, K)
    assert K % B == 0, f"K={K} must be a multiple of block_size={B}"
    assert not (act_order and hybrid_order), \
        "hybrid_order (GAR) is not allowed with act_order"
    n_groups = K // G
    # groups must align with panels for the dynamic-group path
    dynamic_groups = (not static_groups) and (not act_order) and G <= B and B % G == 0

    Wt = W.astype(jnp.float32).T  # [N, K]

    fp8_scale = jnp.float32(1.0)
    if fp8_aware:
        # pow2 per-tensor scale into the protective e4m3 range
        fullscale = 448.0  # e4m3 max
        maxq = 2 ** (bits - 1) - 1
        _FP8_PROTECTIVE = fullscale - fullscale / maxq
        absmax = jnp.max(jnp.abs(Wt))
        fp8_scale = 2.0 ** jnp.ceil(
            jnp.log2(jnp.maximum(absmax / _FP8_PROTECTIVE, 1e-30)))
        Wt = Wt / fp8_scale

        def _fp8_snap(q):
            q = jnp.clip(q, -_FP8_PROTECTIVE, _FP8_PROTECTIVE)
            return q.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    else:
        def _fp8_snap(q):
            return q

    # dead input dims
    diag = jnp.diagonal(H)
    dead = diag == 0.0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    Wt = jnp.where(dead[None, :], 0.0, Wt)

    perm = None
    gar_perm = None
    if hybrid_order:
        d = jnp.diagonal(H).reshape(n_groups, G)
        local = jnp.argsort(-d, axis=1)                    # within-group order
        gperm = jnp.argsort(-jnp.max(d, axis=1))           # group order
        gar_perm = (local + (jnp.arange(n_groups) * G)[:, None]
                    )[gperm].reshape(K)
        Wt = Wt[:, gar_perm]
        H = H[gar_perm][:, gar_perm]
    if act_order:
        perm = jnp.argsort(-jnp.diagonal(H))
        Wt = Wt[:, perm]
        H = H[perm][:, perm]

    # static group parameters from the (permuted) original weights, defined
    # on ORIGINAL column positions (reference static_groups, gptq.py:1193)
    if act_order or not dynamic_groups:
        if hybrid_order or perm is None:
            W0 = Wt  # hybrid: groups live on the PERMUTED grid
        else:
            W0 = Wt[:, jnp.argsort(perm)]  # original order
        w_groups = W0.reshape(N, n_groups, G)
        s_all, z_all = jax.vmap(
            lambda wg: _group_scale(wg, bits, sym, codebook),
            in_axes=1, out_axes=0,
        )(w_groups)  # [n_groups, N]
        if act_order:
            g_of_col = perm // G  # group id of each (permuted) column
        else:
            g_of_col = jnp.arange(K) // G
    else:
        s_all = jnp.zeros((n_groups, N), dtype=jnp.float32)
        z_all = jnp.zeros((n_groups, N), dtype=jnp.float32)
        g_of_col = jnp.arange(K) // G

    # damped Cholesky inverse, upper factor (reference gptq.py:1221-1231).
    # Computed WITHOUT forming Hinv: with J the reversal permutation and
    # L̃ = chol(JHJ), the upper factor satisfying Hinv = UᵀU is
    # U = J·L̃⁻¹·J  (H = C⁻ᵀC⁻¹ ⇒ C⁻ᵀ is an upper factor of H, and
    # reversal turns upper-times-upperᵀ into ordinary Cholesky form).
    # The direct cho_solve(eye(K)) route OOMs the TPU compiler at 7B
    # scale: XLA's K-sized triangular_solve keeps O(K/128) panel temps
    # live (~20 GB at K=11008); the blocked inverse is fori_loop-bounded.
    damp = percdamp * jnp.mean(jnp.diagonal(H))
    H = H + damp * jnp.eye(K, dtype=jnp.float32)
    Lrev = jnp.linalg.cholesky(H[::-1, ::-1])
    U = _tril_inverse_blocked(Lrev)[::-1, ::-1]  # upper factor of Hinv

    nb = K // B
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def panel_step(b, carry):
        Wt, Q, s_all, z_all = carry
        start = b * B
        Wblk = jax.lax.dynamic_slice(Wt, (0, start), (N, B))
        U_rows = jax.lax.dynamic_slice(U, (start, 0), (B, K))  # [B, K]
        Ublk = jax.lax.dynamic_slice(U_rows, (0, start), (B, B))

        def col_step(i, inner):
            Wblk, Qblk, Err, s_all, z_all, cur_s, cur_z = inner
            gcol = start + i
            if dynamic_groups:
                # at a group boundary, compute scale from current values
                def new_group(args):
                    Wblk, s_all, z_all = args
                    base = (i // G) * G
                    wg = jax.lax.dynamic_slice(Wblk, (0, base), (N, G))
                    s, z = _group_scale(wg, bits, sym, codebook)
                    gidx = (start + base) // G
                    s_all = jax.lax.dynamic_update_slice(s_all, s[None, :],
                                                         (gidx, 0))
                    z_all = jax.lax.dynamic_update_slice(z_all, z[None, :],
                                                         (gidx, 0))
                    return s, z, s_all, z_all

                def old_group(args):
                    Wblk, s_all, z_all = args
                    return cur_s, cur_z, s_all, z_all

                cur_s, cur_z, s_all, z_all = jax.lax.cond(
                    i % G == 0, new_group, old_group, (Wblk, s_all, z_all))
                s, z = cur_s, cur_z
            else:
                gid = g_of_col[gcol]
                s = s_all[gid]
                z = z_all[gid]

            w = jax.lax.dynamic_slice(Wblk, (0, i), (N, 1))[:, 0]
            q = _fp8_snap(_qdq_col(w, s, z, bits, sym, codebook))
            d = jax.lax.dynamic_slice(Ublk, (i, i), (1, 1))[0, 0]
            err = (w - q) / d
            # update remaining columns in panel
            urow = jax.lax.dynamic_slice(Ublk, (i, 0), (1, B))[0]  # [B]
            mask = (col_idx > i).astype(jnp.float32)
            Wblk = Wblk - err[:, None] * (urow * mask)[None, :]
            Qblk = jax.lax.dynamic_update_slice(Qblk, q[:, None], (0, i))
            Err = jax.lax.dynamic_update_slice(Err, err[:, None], (0, i))
            return Wblk, Qblk, Err, s_all, z_all, cur_s, cur_z

        init = (Wblk, jnp.zeros((N, B), jnp.float32),
                jnp.zeros((N, B), jnp.float32), s_all, z_all,
                jnp.ones((N,), jnp.float32), jnp.zeros((N,), jnp.float32))
        Wblk, Qblk, Err, s_all, z_all, _, _ = jax.lax.fori_loop(
            0, B, col_step, init)

        # propagate error to all later columns: W[:, start+B:] -= Err @ U[blk, start+B:]
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)[0]
        tail_mask = (k_idx >= start + B).astype(jnp.float32)
        Wt = Wt - (Err @ (U_rows * tail_mask[None, :]))
        Q = jax.lax.dynamic_update_slice(Q, Qblk, (0, start))
        return Wt, Q, s_all, z_all

    Q0 = jnp.zeros((N, K), jnp.float32)
    Wt, Q, s_all, z_all = jax.lax.fori_loop(
        0, nb, panel_step, (Wt, Q0, s_all, z_all))

    if perm is not None:
        inv = jnp.argsort(perm)
        Q = Q[:, inv]
    if fp8_aware:
        Q = Q * fp8_scale
        s_all = s_all * fp8_scale

    # Q/s_all/z_all: [K, N], [n_groups, N], [n_groups, N]. With hybrid_order
    # they are in gar_perm order (groups contiguous); the caller stores
    # gar_perm on the packed weight. fp8_scale is the bf16->fp8 pow2 scale.
    return Q.T, s_all, z_all, gar_perm, fp8_scale


def gptq_layer_to_woq(kernel, H, cfg, bias=None) -> WOQLinear:
    """Full GPTQ on one kernel → packed WOQLinear."""
    K, N = kernel.shape
    G = cfg.group_size if cfg.group_size > 0 else K
    G = min(G, K)
    cfg_dtype = getattr(cfg, "weight_dtype", getattr(cfg, "dtype", "int"))
    wdtype = cfg_dtype if cfg_dtype in FLOAT_CODE_DTYPES else "int"
    hybrid = bool(getattr(cfg, "hybrid_order", False))
    fp8_aware = bool(getattr(cfg, "fp8_aware", False))
    if fp8_aware and wdtype != "int":
        raise ValueError("fp8_aware GPTQ is an int/W4A8 flow; it cannot be "
                         f"combined with codebook dtype {cfg_dtype!r}")
    # ragged K: pad with dead input dims (H diag 0 → damped + weight zeroed
    # inside the sweep) so groups and panels tile evenly, like the rest of
    # the stack (ops.qtensor._grouped / ops.packing pad ragged K too).
    pad = (-K) % G
    if pad:
        if hybrid:
            raise ValueError(
                f"hybrid_order (GAR) needs in_features ({K}) to be a "
                f"multiple of group_size ({G}): the returned input "
                "permutation must cover exactly the real input dims")
        kernel = jnp.pad(kernel, ((0, pad), (0, 0)))
        H = jnp.pad(H, ((0, pad), (0, pad)))
    Kp = K + pad
    B = min(cfg.block_size, Kp)
    if Kp % B:  # fall back to a divisor panel size (G always divides Kp)
        B = G
    Wq, s_all, z_all, gar_perm, fp8_scale = gptq_quantize_matrix(
        kernel, H, bits=cfg.weight_bits, group_size=G,
        sym=cfg.use_sym, act_order=cfg.act_order, percdamp=cfg.percdamp,
        block_size=B, static_groups=cfg.static_groups, hybrid_order=hybrid,
        fp8_aware=fp8_aware, wdtype=wdtype)
    Wq = Wq[:K]
    if wdtype in FLOAT_CODE_DTYPES:
        wg = _grouped(Wq, G)  # [n_groups, G, N] (re-pads ragged K)
        codes = _codebook_nearest(wg / s_all[:, None, :],
                                  CODEBOOKS[wdtype]).reshape(-1, N)[:K]
        qt = QTensor(codes, s_all, None, wdtype, cfg.weight_bits, G, (K, N))
        return WOQLinear.from_qtensor(qt, bias=bias)
    zeros = None if cfg.use_sym else z_all
    codes = quantize_with_scale(Wq, s_all, zeros, cfg.weight_bits, G,
                                scheme=cfg.scheme)
    qt = QTensor(codes, s_all, zeros, "int", cfg.weight_bits, G, (K, N))
    lin = WOQLinear.from_qtensor(qt, bias=bias, perm=gar_perm)
    if fp8_aware:
        # recorded for the fp8/W4A8 serving flow (values already on the
        # protective e4m3 grid; the matmul itself needs no change)
        lin.scale_bf16_to_fp8 = nnx.Param(fp8_scale)
    return lin


# ---------------------------------------------------------------------------
# Entry: prepare (capture) / convert (block-sequential quantize)
# ---------------------------------------------------------------------------

_capture_states: dict[int, CalibCaptureState] = {}
_pending_run: dict[int, tuple] = {}


@register_algo("gptq")
def gptq_entry(model, configs_mapping, mode="quantize", run_fn=None,
               run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        blocks = find_target_blocks(model)
        assert blocks is not None, "GPTQ requires a transformer block list"
        st = CalibCaptureState(model, *blocks)
        st.attach()
        _capture_states[id(model)] = st
        return model

    if mode == "convert":
        st = _capture_states.pop(id(model), None)
        assert st is not None, "convert() before prepare() for GPTQ"
        captured = st.detach()
        return _convert(model, st.block_paths, captured, configs_mapping)

    # one-shot quantize
    blocks = find_target_blocks(model)
    assert blocks is not None, "GPTQ requires a transformer block list"
    st = CalibCaptureState(model, *blocks)
    captured = run_capture(model, st, run_fn, run_args)
    assert captured, "GPTQ calibration captured no batches — did run_fn call the model?"
    return _convert(model, st.block_paths, captured, configs_mapping)


def _convert(model, block_paths, captured, configs_mapping):
    cfg_by_name = {name: cfg for (name, _t), cfg in configs_mapping.items()}
    n_done = 0
    inputs = captured  # list of (args, kwargs) feeding the current block

    for bi, bpath in enumerate(block_paths):
        block = get_module(model, bpath)
        # find target linears (incl. MHA LinearGeneral projections —
        # reference GPTQ SUPPORTED_LAYERS also covers non-Linear ops,
        # weight_only/gptq.py:45) in this block
        from ..layers.module_utils import module_type_name
        targets = []
        for sub_path, sub in named_modules(block):
            if not sub_path:
                continue
            full = f"{bpath}.{sub_path}"
            cfg = cfg_by_name.get(full)
            if cfg is None or cfg.dtype in _FLOAT_SKIP:
                continue
            if (extract_linear(sub) is None
                    and module_type_name(sub) != "LinearGeneral"):
                continue
            targets.append((sub_path, full, sub))

        if targets:
            # true_sequential (reference gptq.py:527-566): quantize the
            # block's sub-groups in forward order, refreshing Hessians
            # through the already-quantized earlier groups. Otherwise one
            # pass over all targets from the same block inputs.
            if any(cfg_by_name[f].true_sequential for _s, f, _m in targets):
                seen = []
                groups: list[list] = []
                for t in targets:
                    prefix = t[0].split(".")[0]
                    if prefix not in seen:
                        seen.append(prefix)
                        groups.append([])
                    groups[seen.index(prefix)].append(t)
            else:
                groups = [targets]
            for group in groups:
                # 1) attach Hessian observers, replay batches
                for sub_path, _full, sub in group:
                    if module_type_name(sub) == "LinearGeneral":
                        from ..layers.qconv import linear_general_qmatrix

                        k2, _b, _o, n_in = linear_general_qmatrix(sub)
                        obs = HessianObserver(sub, k2.shape[0],
                                              n_in_dims=n_in)
                    else:
                        k, _b = extract_linear(sub)
                        obs = HessianObserver(sub, k.shape[0])
                    replace_module(block, sub_path, obs)
                for args, kwargs in inputs:
                    block(*args, **kwargs)
                # 2) quantize each target, swap in the packed module
                for sub_path, full, sub in group:
                    obs = get_module(block, sub_path)
                    H = obs.hessian()
                    cfg = cfg_by_name[full]
                    if module_type_name(sub) == "LinearGeneral":
                        from ..layers.qconv import (WOQLinearGeneral,
                                                    linear_general_qmatrix)

                        k2, bias, out_shape, n_in = \
                            linear_general_qmatrix(sub)
                        lin = gptq_layer_to_woq(k2, H, cfg, bias=None)
                        new = WOQLinearGeneral(lin.packed_weight(),
                                               out_shape, n_in, bias=bias)
                    else:
                        kernel, bias = extract_linear(sub)
                        new = gptq_layer_to_woq(kernel, H, cfg, bias=bias)
                    replace_module(block, sub_path, new)
                    n_done += 1
        # 3) replay through the (now quantized) block to build next inputs
        if bi + 1 < len(block_paths):
            inputs = [
                (_as_next_input(block(*args, **kwargs), args), kwargs)
                for args, kwargs in inputs
            ]

    n_done += _maybe_quantize_lm_head(model, block_paths, inputs,
                                      cfg_by_name)
    logger.info("GPTQ quantized %d Linear ops over %d blocks",
                n_done, len(block_paths))
    dump_op_stats(model)
    return model


_TAIL_NORM_NAMES = ("norm", "ln_f", "final_layer_norm", "final_layernorm")


def _maybe_quantize_lm_head(model, block_paths, last_inputs, cfg_by_name):
    """GPTQ the lm_head (reference gptq.py lm_head support via
    ``quant_lm_head``). The head's Hessian is built from the last block's
    outputs passed through the model's tail norm (discovered on the block
    list's parent module by conventional attribute name)."""
    from ..quantization.config import LM_HEAD_NAMES

    target = None
    for path, mod in named_modules(model):
        leaf = path.rsplit(".", 1)[-1]
        if leaf in LM_HEAD_NAMES and extract_linear(mod) is not None:
            cfg = cfg_by_name.get(path)
            if cfg is not None and cfg.dtype not in _FLOAT_SKIP:
                target = (path, mod, cfg)
            break
    if target is None:
        return 0
    path, head, cfg = target

    list_path = block_paths[0].rsplit(".", 1)[0]
    parent_path = list_path.rsplit(".", 1)[0] if "." in list_path else ""
    parent = get_module(model, parent_path) if parent_path else model
    tail_norm = None
    for name in _TAIL_NORM_NAMES:
        cand = getattr(parent, name, None)
        if cand is not None and callable(cand):
            tail_norm = cand
            break
    if tail_norm is None:
        logger.warning("GPTQ lm_head: no tail norm found on %r — using the "
                       "last block's raw outputs for the Hessian",
                       parent_path or "<root>")
        tail_norm = lambda x: x  # noqa: E731

    last_block = get_module(model, block_paths[-1])
    kernel, bias = extract_linear(head)
    K = kernel.shape[0]
    xtx = jnp.zeros((K, K), jnp.float32)
    count = jnp.array(0.0, jnp.float32)
    for args, kwargs in last_inputs:
        out = last_block(*args, **kwargs)
        x = out[0] if isinstance(out, tuple) else out
        xtx, count = _xtx_update(xtx, count, tail_norm(x))
    H = 2.0 * xtx / jnp.maximum(count, 1.0)
    new = gptq_layer_to_woq(kernel, H, cfg, bias=bias)
    replace_module(model, path, new)
    logger.info("GPTQ quantized lm_head (%s)", path)
    return 1


def _as_next_input(block_out, prev_args):
    """Blocks may return x or (x, aux); thread x into the next block's args."""
    x = block_out[0] if isinstance(block_out, tuple) else block_out
    return (x, *prev_args[1:])
