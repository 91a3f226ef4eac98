"""Calibration observers as NNX state — functional analog of the reference's
observer machinery (MinMaxObserver Keras layers, jax/quantization/
layers_static.py:68-153; FP8 MaxAbs observers, torch/algorithms/fp8_quant/
observer.py:106-154).

Instead of forward hooks, an ``ObservedLinear`` wrapper module records input
statistics into ``ObserverStat`` variables on every call; stats survive
``nnx.jit`` because they are ordinary NNX state. Multi-chip calibration:
stats are pure maxima/minima, so after a sharded calibration run they are
reduced with ``jax.lax.pmax``-equivalent collectives by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


class ObserverStat(nnx.Variable):
    """Calibration statistic (not a Param — excluded from optimizer state)."""


_NEG_INF = -jnp.inf


class _BaseObserver(nnx.Module):
    kind = "base"

    def reduce_over_mesh(self):
        """Hook for cross-host stat reduction (stats are already global when
        calibration ran under pjit on replicated stats)."""


class MinMaxObserver(_BaseObserver):
    """Tracks per-tensor running min/max of activations."""

    kind = "minmax"

    def __init__(self):
        self.min = ObserverStat(jnp.array(jnp.inf, dtype=jnp.float32))
        self.max = ObserverStat(jnp.array(-jnp.inf, dtype=jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        self.min[...] = jnp.minimum(self.min[...], jnp.min(xf))
        self.max[...] = jnp.maximum(self.max[...], jnp.max(xf))
        return x

    def get_scale_zp(self, bits: int = 8, sym: bool = False):
        if sym:
            qmax = 2 ** (bits - 1) - 1
            scale = jnp.maximum(jnp.abs(self.min[...]), jnp.abs(self.max[...])) / qmax
            scale = jnp.where(scale <= 0, 1.0, scale)
            return scale, None
        qmax = 2**bits - 1
        scale = (self.max[...] - self.min[...]) / qmax
        scale = jnp.where(scale <= 0, 1.0, scale)
        zp = jnp.round(-self.min[...] / scale) - 2 ** (bits - 1)
        return scale, zp


class MaxAbsObserver(_BaseObserver):
    """Tracks per-tensor running max|x| (FP8 & sym-int8 static scales)."""

    kind = "maxabs"

    def __init__(self):
        self.amax = ObserverStat(jnp.array(0.0, dtype=jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        self.amax[...] = jnp.maximum(self.amax[...],
                                     jnp.max(jnp.abs(x.astype(jnp.float32))))
        return x


class MaxAbsPerChannelObserver(_BaseObserver):
    """Per-(last-dim)-channel max|x| — SmoothQuant/AWQ activation stats."""

    kind = "maxabs_per_channel"

    def __init__(self, num_channels: int):
        self.amax = ObserverStat(jnp.zeros((num_channels,), dtype=jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = jnp.abs(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
        self.amax[...] = jnp.maximum(self.amax[...], jnp.max(xf, axis=0))
        return x


_OBSERVERS = {
    "minmax": MinMaxObserver,
    "maxabs": MaxAbsObserver,
    "maxabs_per_channel": MaxAbsPerChannelObserver,
}


def make_observer(kind: str, **kwargs) -> _BaseObserver:
    return _OBSERVERS[kind](**kwargs)


class ObservedLinear(nnx.Module):
    """Wraps a Linear-like module, observing its input (and optionally output).

    The prepare pass swaps ``Linear -> ObservedLinear(inner)``; the convert
    pass reads the stats and swaps in the final quantized module.
    """

    def __init__(self, inner: nnx.Module, act_observer: _BaseObserver,
                 out_observer: _BaseObserver | None = None):
        self.inner = inner
        self.act_observer = act_observer
        self.out_observer = out_observer

    def __call__(self, x, *args, **kwargs):
        self.act_observer(x)
        y = self.inner(x, *args, **kwargs)
        if self.out_observer is not None:
            self.out_observer(y)
        return y
