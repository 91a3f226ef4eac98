"""Post-quantization projection fusion for serving.

Group-wise quantization is exact under output-dim concatenation (scales are
per (group, out-channel)), so separately-quantized q/k/v (and gate/up)
projections fuse into one packed matmul with bit-identical results. At
decode batch the step cost is dominated by per-op overhead, so cutting 7
matmul calls per layer to 4 is a direct win.

Reference counterpart: none — the reference delegates serving to external
stacks; this is part of our serving runtime.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common import logger
from ..layers.module_utils import named_modules
from ..layers.woq_linear import WOQLinear
from ..ops.packing import PackedWeight


def _fusible(mods) -> bool:
    # WOQLinear or W4A8Linear groups fuse (output-dim concat is layout-
    # preserving for both tpu_strided and s4_rowpack); mixed types don't
    from ..layers.woq_linear import W4A8Linear

    ref = mods[0]
    if type(ref) not in (WOQLinear, W4A8Linear):
        return False
    if not all(type(m) is type(ref) for m in mods):
        return False
    for m in mods:
        if (m.bits != ref.bits or m.group_size != ref.group_size
                or m.wdtype != ref.wdtype or m.layout != ref.layout
                or m.in_features != ref.in_features
                or (m.zeros is None) != (ref.zeros is None)
                or (m.bias is None) != (ref.bias is None)
                or m.pre_scale is not None
                or m.perm is not None          # act-order/GAR rows differ
                or m.sq_scales is not None     # double-quant meta differs
                or m.tp_role != ref.tp_role):  # same TP role or none
            return False
    return True


def _concat_woq(mods) -> WOQLinear:
    ref = mods[0]
    pw = PackedWeight(
        packed=jnp.concatenate([m.packed[...] for m in mods], axis=1),
        scales=jnp.concatenate([m.scales[...] for m in mods], axis=1),
        zeros=(jnp.concatenate([m.zeros[...] for m in mods], axis=1)
               if ref.zeros is not None else None),
        bits=ref.bits, group_size=ref.group_size, dtype=ref.wdtype,
        orig_shape=(ref.in_features,
                    sum(m.out_features for m in mods)),
        layout=ref.layout)
    bias = (jnp.concatenate([m.bias[...] for m in mods])
            if ref.bias is not None else None)
    fused = type(ref)(pw, bias=bias, impl=ref.impl)
    # identical TP roles survive fusion (q/k/v are all column-parallel
    # with the same axes; the N-concat shards exactly like the parts)
    fused.tp_role = ref.tp_role
    fused.tp_mesh = ref.tp_mesh
    return fused


def fuse_for_serving(model) -> int:
    """Fuse q/k/v and gate/up WOQLinears in place. Returns #fusions."""
    n = 0
    for _path, mod in named_modules(model):
        t = type(mod).__name__
        if t == "LlamaAttention" and getattr(mod, "qkv_proj", None) is None:
            mods = [mod.q_proj, mod.k_proj, mod.v_proj]
            if _fusible(mods):
                mod.qkv_proj = _concat_woq(mods)
                mod.q_proj = mod.k_proj = mod.v_proj = None
                n += 1
        elif t == "LlamaMLP" and getattr(mod, "gate_up_proj", None) is None:
            mods = [mod.gate_proj, mod.up_proj]
            if _fusible(mods):
                mod.gate_up_proj = _concat_woq(mods)
                mod.gate_proj = mod.up_proj = None
                n += 1
    logger.info("Fused %d projection groups for serving", n)
    return n


def to_w4a8_serving(model, s4: bool | str = "auto") -> int:
    """Swap every WOQLinear (fused included) for a W4A8Linear in place.

    Same packed int4 weights; activations are dynamically quantized to
    int8 at runtime (reference HPUMixedPrecisionLinear,
    mixed_low_precision/modules.py:31), so no calibration is needed.

    ``s4``: serving-layout selector for eligible sym-int4 weights.
      * "auto"/"u4k" (default on TPU): "u4_kpack" — u32 words holding 8
        K-direction nibbles, unpacked IN-KERNEL via pltpu.bitcast
        (kernels/fused_matvec.py). No XLA-level int4 view exists, so
        nothing gets re-materialized inside the decode loop and the
        buffer shards under TP shard_map.
      * "s4": the round-2 "s4_rowpack" zero-copy-view layout
        (kernels/s4_matmul.py), kept for comparison.
      * False: keep "tpu_strided" (shift-plane kernels).
    Returns the number of modules converted."""
    import jax as _jax

    from ..layers.module_utils import replace_module
    from ..layers.woq_linear import W4A8Linear
    from ..ops.packing import to_s4_rowpack, to_u4_kpack

    if s4 == "auto":
        s4 = "u4k" if _jax.default_backend() == "tpu" else False
    elif s4 is True:
        s4 = "s4"

    def _maybe_s4(pw, tp_role=None, tp_mesh=None):
        if (s4 and pw.layout == "tpu_strided" and pw.bits == 4
                and pw.dtype == "int" and pw.zeros is None):
            if s4 == "u4k":
                K, N = pw.orig_shape
                ok = K % 8 == 0 and N % 128 == 0
                if ok and tp_role is not None:
                    # per-shard tiles must stay aligned: u4_kpack shards
                    # under shard_map (unlike s4_rowpack), check the
                    # sharded dim keeps 8-row words / 128-lane tiles whole
                    kind, axis, _da = tp_role
                    tp = tp_mesh.shape[axis]
                    if kind == "column":
                        ok = N % tp == 0 and (N // tp) % 128 == 0
                    else:
                        ok = (K % tp == 0 and (K // tp) % 8 == 0
                              and (K // 8) % tp == 0)
                if ok:
                    return to_u4_kpack(pw), 1
                return pw, 0
            if tp_role is None and pw.orig_shape[1] % 256 == 0:
                return to_s4_rowpack(pw), 1
        return pw, 0

    def _w4a8_eligible(pw):
        # the int8-MXU path needs sym int4 tpu_strided weights; anything
        # else (asym/zeros, nf4/fp4, 2-bit, "int8" layout) would only be
        # DOWNGRADED by the swap — w4a8_matmul falls back to XLA
        # dequant+dot, losing WOQLinear's fused Pallas kernels, and the
        # TP w4a8 kernels are symmetric-only (zeros would be dropped)
        return (pw.layout == "tpu_strided" and pw.bits == 4
                and pw.dtype == "int" and pw.zeros is None)

    n = n_s4 = n_skip = 0
    for path, mod in list(named_modules(model)):
        if type(mod) is WOQLinear:
            pw = mod.packed_weight()
            if not _w4a8_eligible(pw):
                n_skip += 1
                continue
            pw, up = _maybe_s4(pw, mod.tp_role, mod.tp_mesh)
            n_s4 += up
            w4a8 = W4A8Linear(
                pw,
                bias=None if mod.bias is None else mod.bias[...],
                impl=mod.impl,
                pre_scale=(None if mod.pre_scale is None
                           else mod.pre_scale[...]))
            w4a8.tp_role = mod.tp_role
            w4a8.tp_mesh = mod.tp_mesh
            replace_module(model, path, w4a8)
            n += 1
        elif type(mod) is W4A8Linear and mod.layout == "tpu_strided":
            # e.g. hybrid_gptq already produced W4A8 modules — upgrade the
            # storage layout in place
            pw, up = _maybe_s4(mod.packed_weight(), mod.tp_role,
                               mod.tp_mesh)
            if up:
                mod.packed = type(mod.packed)(pw.packed)
                mod.layout = pw.layout
                n_s4 += up
                n += 1
    if n_skip:
        logger.info("to_w4a8_serving: left %d non-sym-int4 module(s) on "
                    "their WOQLinear kernels", n_skip)
    logger.info("Converted %d modules to W4A8 serving (%d native-int4)",
                n, n_s4)
    return n


def enable_fused_decode(model, fold_norms: bool = True) -> int:
    """Flag llama decoder layers (and the lm_head) for the fused B=1
    decode path (models/llama.LlamaDecoderLayer._fused_call): one pallas
    call per projection subsuming RMSNorm, act quant, silu and residual
    glue (kernels/fused_matvec.py). Requires the fused qkv/gate_up
    projections on "u4_kpack" W4A8 modules. Run AFTER fuse_for_serving +
    to_w4a8_serving. Returns the number of layers flagged."""
    from ..layers.woq_linear import W4A8Linear

    def _ok(m):
        return (type(m) is W4A8Linear and m.layout == "u4_kpack"
                and m.pre_scale is None and m.perm is None
                and m.tp_role is None and m.group_size % 128 == 0)

    inner = getattr(model, "model", None)
    layers = getattr(inner, "layers", None)
    if layers is None:
        return 0
    n = n_layers = 0
    for layer in layers:
        if type(layer).__name__ != "LlamaDecoderLayer":
            continue
        n_layers += 1
        attn, mlp = layer.self_attn, layer.mlp
        if (attn.qkv_proj is not None and mlp.gate_up_proj is not None
                and _ok(attn.qkv_proj) and _ok(attn.o_proj)
                and _ok(mlp.gate_up_proj) and _ok(mlp.down_proj)
                and type(layer.input_layernorm).__name__ == "RMSNorm"
                and type(layer.post_attention_layernorm).__name__
                == "RMSNorm"):
            layer.fused_decode = True
            layer.fused_fold_norms = fold_norms
            n += 1
    head = getattr(model, "lm_head", None)
    if (n and head is not None and _ok(head)
            and type(inner.norm).__name__ == "RMSNorm"):
        # fold the final norm into the quantized lm_head kernel; the
        # CausalLM forward applies the norm itself whenever it cannot fuse
        inner.norm_in_head = True
    logger.info("Fused decode enabled on %d/%d layer(s)%s", n, n_layers,
                " + lm_head" if getattr(inner, "norm_in_head", False)
                else "")
    return n


# A/B lever (measured slower — see s4_prepare docstring); default OFF
SC_IN_WEIGHTS = False


def s4_prepare(model) -> int:
    """Materialize the per-program serving form of the packed weights.

    MUST run INSIDE the jitted serving program, on the module merged from
    (graphdef, state), BEFORE the decode/prefill loop. Two transforms:

    * "s4_rowpack" → zero-copy int4 view: int4 arrays cannot cross a
      dispatch boundary under the remote-TPU plugin, and leaving the view
      to be taken per matmul call makes XLA re-materialize it inside the
      loop at ~20 GB/s (experiments/s4_integration_ab.log — hoisted, the
      same kernel streams 680-740 GB/s).
    * "u4_kpack" (fused-decode eligible, non-TP) → "u4_kpack_sc" when
      ``SC_IN_WEIGHTS`` is True: the f32 group scales are appended to the
      packed buffer as bitcast u32 rows so the fused matvec takes ONE
      weight operand. MEASURED SLOWER (169.4 vs 175.6 tok/s llama2-7b):
      the separate scale operands' MSA copies are overlapped prefetch,
      not lost time — kept as an A/B lever, default OFF (PERF_NOTES.md).

    ``generation.generate``, ``serving.engine`` and ``bench.py`` all call
    this right after their nnx.merge. No-op (returns 0) when nothing is
    eligible."""
    import jax as _jax
    import jax.numpy as _jnp

    from ..kernels.fused_matvec import _on_tpu
    from ..layers.woq_linear import W4A8Linear
    from ..ops.packing import s4_view, u4k_append_scales

    n = 0
    on_tpu = _on_tpu() and SC_IN_WEIGHTS
    for _path, mod in named_modules(model):
        if type(mod) is not W4A8Linear:
            continue
        if (mod.layout == "s4_rowpack"
                and mod.packed[...].dtype == _jnp.uint32):
            K, N = mod.in_features, mod.out_features
            mod.packed = type(mod.packed)(_jax.lax.optimization_barrier(
                s4_view(mod.packed[...], K, N)))
            n += 1
        elif (on_tpu and mod.layout == "u4_kpack" and mod.tp_role is None
                and mod.zeros is None and mod.perm is None
                and mod.sq_scales is None):
            pw = u4k_append_scales(mod.packed_weight())
            mod.packed = type(mod.packed)(
                _jax.lax.optimization_barrier(pw.packed))
            mod.layout = "u4_kpack_sc"
            n += 1
    return n
