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


class HistogramObserver(_BaseObserver):
    """Running |x| histogram over fixed log2-magnitude bins.

    The reference's static-quant stacks offer histogram/percentile/MSE
    ("kl"-style) activation calibration (fp8_quant/observer.py:106-154 and
    the IPEX static recipes); this is the jit-friendly TPU version: bins are
    STATIC (log2|x| in [-24, 24), ``n_bins`` buckets) so the accumulation
    is a pure scatter-add under jit, with no data-dependent re-binning.

    ``get_scale(bits, method=...)``:
      * "percentile" — smallest clip covering ``percentile``% of mass
      * "mse"        — clip minimizing the expected squared quant error
                       (evaluated over the histogram, candidates = the
                       top-40 bin edges)
      * "max"        — plain maxabs
    """

    kind = "histogram"
    LOG2_MIN, LOG2_MAX = -24.0, 24.0

    def __init__(self, n_bins: int = 512):
        self.n_bins = n_bins
        self.counts = ObserverStat(jnp.zeros((n_bins,), dtype=jnp.float32))
        self.amax = ObserverStat(jnp.array(0.0, dtype=jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = jnp.abs(x.astype(jnp.float32)).reshape(-1)
        self.amax[...] = jnp.maximum(self.amax[...], jnp.max(xf))
        lg = jnp.log2(jnp.maximum(xf, 2.0 ** self.LOG2_MIN))
        width = (self.LOG2_MAX - self.LOG2_MIN) / self.n_bins
        idx = jnp.clip(((lg - self.LOG2_MIN) / width).astype(jnp.int32),
                       0, self.n_bins - 1)
        # accumulate one per-call bincount, not unit scatter-adds: a f32
        # bin saturates at 2^24 under x+1.0, silently flattening dominant
        # bins on large calibration sets (a batched bincount only loses
        # ~1 part in 2^24 per call, which percentile/MSE can't see)
        self.counts[...] = self.counts[...] + jnp.bincount(
            idx, length=self.n_bins).astype(jnp.float32)
        return x

    def _bin_uppers(self):
        width = (self.LOG2_MAX - self.LOG2_MIN) / self.n_bins
        edges = self.LOG2_MIN + width * (jnp.arange(self.n_bins) + 1.0)
        return jnp.exp2(edges)  # upper |x| of each bin

    def percentile_amax(self, percentile: float = 99.99):
        counts = self.counts[...]
        total = jnp.maximum(jnp.sum(counts), 1.0)
        cdf = jnp.cumsum(counts) / total
        covered = cdf >= (percentile / 100.0)
        uppers = self._bin_uppers()
        big = jnp.max(uppers)
        clip = jnp.min(jnp.where(covered, uppers, big))
        return jnp.minimum(clip, self.amax[...])

    def mse_amax(self, bits: int = 8):
        """Clip minimizing E[(x − qdq(x; clip))²] under sym int-``bits``
        uniform quantization, with x represented by bin upper edges."""
        counts = self.counts[...]
        uppers = self._bin_uppers()
        qmax = 2.0 ** (bits - 1) - 1
        # candidates: highest 40 non-empty bins' uppers (and the true amax)
        nz = counts > 0
        order = jnp.argsort(jnp.where(nz, uppers, -jnp.inf))
        cand = jnp.concatenate(
            [uppers[order[-40:]], self.amax[...][None]])
        cand = jnp.maximum(cand, 1e-12)

        def err_for(c):
            step = c / qmax
            inside = jnp.minimum(uppers, c)
            round_err = (step * step / 12.0)
            clip_err = jnp.square(uppers - inside)
            return jnp.sum(counts * (round_err + clip_err))

        errs = jax.vmap(err_for)(cand)
        return cand[jnp.argmin(errs)]

    def get_scale(self, bits: int = 8, method: str = "percentile",
                  percentile: float = 99.99):
        if method == "mse":
            amax = self.mse_amax(bits)
        elif method == "percentile":
            amax = self.percentile_amax(percentile)
        else:
            amax = self.amax[...]
        qmax = 2.0 ** (bits - 1) - 1
        scale = amax / qmax
        return jnp.where(scale <= 0, 1.0, scale)


_OBSERVERS = {
    "minmax": MinMaxObserver,
    "maxabs": MaxAbsObserver,
    "maxabs_per_channel": MaxAbsPerChannelObserver,
    "histogram": HistogramObserver,
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
