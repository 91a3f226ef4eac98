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

    ``s4``: convert eligible sym-int4 weights to the "s4_rowpack" native-
    int4 layout (kernels/s4_matmul.py — Mosaic hardware unpack, measured
    1.3-1.6x the shift-plane kernel at decode). "auto" = only on a TPU
    backend; multi-chip TP serving repacks back to "tpu_strided"
    (models/sharding.enable_tp_serving).
    Returns the number of modules converted."""
    import jax as _jax

    from ..layers.module_utils import replace_module
    from ..layers.woq_linear import W4A8Linear
    from ..ops.packing import to_s4_rowpack

    if s4 == "auto":
        s4 = _jax.default_backend() == "tpu"

    def _maybe_s4(pw):
        if (s4 and pw.layout == "tpu_strided" and pw.bits == 4
                and pw.dtype == "int" and pw.zeros is None
                and pw.orig_shape[1] % 256 == 0):
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
            if mod.tp_role is None:
                pw, up = _maybe_s4(pw)
                n_s4 += up
            # TP-tagged modules stay tpu_strided: the per-shard int8-MXU
            # kernel (kernels/tp_matmul.py) cannot hoist the s4 view
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
        elif (type(mod) is W4A8Linear and mod.layout == "tpu_strided"
                and mod.tp_role is None):
            # e.g. hybrid_gptq already produced W4A8 modules — upgrade the
            # storage layout in place (TP-tagged modules must stay
            # tpu_strided: the per-shard kernels cannot hoist the s4 view)
            pw, up = _maybe_s4(mod.packed_weight())
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


def s4_prepare(model) -> int:
    """Materialize the zero-copy int4 view of every "s4_rowpack" weight.

    MUST run INSIDE the jitted serving program, on the module merged from
    (graphdef, state), BEFORE the decode/prefill loop: int4 arrays cannot
    cross a dispatch boundary under the remote-TPU plugin, and leaving the
    view to be taken per matmul call makes XLA re-materialize it inside
    the loop at ~20 GB/s (experiments/s4_integration_ab.log — hoisted, the
    same kernel streams 680-740 GB/s). ``generation.generate``,
    ``serving.engine`` and ``bench.py`` all call this right after their
    nnx.merge. No-op (returns 0) when nothing is eligible."""
    import jax as _jax
    import jax.numpy as _jnp

    from ..layers.woq_linear import W4A8Linear
    from ..ops.packing import s4_view

    n = 0
    for _path, mod in named_modules(model):
        if (type(mod) is W4A8Linear and mod.layout == "s4_rowpack"
                and mod.packed[...].dtype == _jnp.uint32):
            K, N = mod.in_features, mod.out_features
            mod.packed = type(mod.packed)(_jax.lax.optimization_barrier(
                s4_view(mod.packed[...], K, N)))
            n += 1
    return n
