"""FP8 scale methods — the reference's scale-method table, TPU-native.

Parity target: fp8_quant/_core/scale_methods/scale_method_config.py:22-67
(13 named methods) and scales_method.py. Each method is a combination of
three orthogonal choices, which is how we implement them:

  * granularity: per-tensor ("pts") or per-channel ("pcs")
  * rounding: "hw" (pow2 clipped to the HW-supported exponent range),
    "pow2", "arbitrary" (no rounding), "unit" (scale = 1)
  * activation mode: "static" (calibrated maxabs) or "dynamic" (per-call)

The named methods of the reference map onto these axes (see METHODS).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# Gaudi-style HW-aligned scales are pow2 within an exponent window; TPU has
# no such constraint but we keep the window for checkpoint compatibility.
_HW_EXP_MIN, _HW_EXP_MAX = -32, 32


@dataclasses.dataclass(frozen=True)
class ScaleMethod:
    weight_granularity: str = "pts"   # pts | pcs
    act_granularity: str = "pts"
    rounding: str = "hw"              # hw | pow2 | arbitrary | unit
    act_dynamic: bool = False


METHODS: dict[str, ScaleMethod] = {
    "unit_scale": ScaleMethod(rounding="unit"),
    "maxabs_hw": ScaleMethod(rounding="hw"),
    "maxabs_pow2": ScaleMethod(rounding="pow2"),
    "maxabs_arbitrary": ScaleMethod(rounding="arbitrary"),
    "maxabs_hw_opt_weight": ScaleMethod(rounding="hw"),
    "maxabs_pow2_opt_weight": ScaleMethod(rounding="pow2"),
    "act_maxabs_pts_weight_maxabs_pts_pow2_hw": ScaleMethod(rounding="hw"),
    "act_maxabs_pts_weight_maxabs_pts_pow2": ScaleMethod(rounding="pow2"),
    "act_maxabs_pts_pow2_weight_maxabs_pcs_pow2": ScaleMethod(
        weight_granularity="pcs", rounding="pow2"),
    "act_maxabs_pts_pow2_hw_weight_maxabs_pcs_pow2": ScaleMethod(
        weight_granularity="pcs", rounding="hw"),
    "act_maxabs_pcs_dyn": ScaleMethod(act_granularity="pcs",
                                      act_dynamic=True,
                                      rounding="arbitrary"),
    "act_maxabs_pts_dyn": ScaleMethod(act_dynamic=True,
                                      rounding="arbitrary"),
    "hw_aligned_single_scale": ScaleMethod(rounding="hw"),
}


def resolve(name: str) -> ScaleMethod:
    if name in METHODS:
        return METHODS[name]
    # heuristic fallback for unlisted names (reference behaviour: pattern
    # match on substrings)
    return ScaleMethod(
        weight_granularity="pcs" if "pcs" in name else "pts",
        rounding=("unit" if "unit" in name else
                  "hw" if "hw" in name else
                  "pow2" if "pow2" in name else "arbitrary"),
        act_dynamic="dyn" in name,
    )


def round_scale(scale, method: ScaleMethod):
    scale = jnp.where(scale <= 0, 1.0, scale)
    if method.rounding == "unit":
        return jnp.ones_like(scale)
    if method.rounding == "arbitrary":
        return scale
    e = jnp.ceil(jnp.log2(scale))
    if method.rounding == "hw":
        e = jnp.clip(e, _HW_EXP_MIN, _HW_EXP_MAX)
    return jnp.exp2(e)
