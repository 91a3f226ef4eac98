"""Calibration observer depth: histogram/percentile/MSE activation
calibration and per-channel static activation scales.

Reference: fp8_quant/observer.py:106-154 (observer variety), IPEX static
recipes (act_algo minmax/kl)."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers.observers import HistogramObserver
from neural_compressor_tpu.layers.qlinear import StaticQuantLinear


def test_histogram_percentile_clips_outliers():
    obs = HistogramObserver()
    rng = np.random.default_rng(0)
    body = rng.uniform(0.5, 1.0, 100_000).astype(np.float32)
    data = np.concatenate([body, np.full(10, 1000.0, np.float32)])
    obs(jnp.asarray(data))
    assert float(obs.amax[...]) == 1000.0
    p = float(obs.percentile_amax(99.9))
    # within one log2 bin (~6.7%) of the body max, outliers clipped away
    assert p < 1.2, p
    assert p >= 0.9, p


def test_histogram_mse_is_argmin_over_candidates():
    """mse_amax must equal the brute-force argmin of the same objective
    evaluated on the histogram (self-consistency), and for outlier-free
    data it should keep (nearly) the full range."""
    obs = HistogramObserver()
    rng = np.random.default_rng(1)
    data = np.concatenate([rng.standard_normal(100_000).astype(np.float32),
                           np.full(5, 500.0, np.float32)])
    obs(jnp.asarray(data))
    m = float(obs.mse_amax(bits=8))
    amax = float(obs.amax[...])
    assert 0.0 < m <= amax
    counts = np.asarray(obs.counts[...])
    uppers = np.asarray(obs._bin_uppers())
    qmax = 127.0

    def err(c):
        step = c / qmax
        inside = np.minimum(uppers, c)
        return float(np.sum(counts * (step * step / 12.0
                                      + np.square(uppers - inside))))

    assert err(m) <= min(err(amax), err(3.0)) * (1 + 1e-5)

    # outlier-free uniform data: MSE keeps ~the full range
    obs2 = HistogramObserver()
    obs2(jnp.asarray(rng.uniform(0, 1, 50_000).astype(np.float32)))
    m2 = float(obs2.mse_amax(bits=8))
    assert m2 > 0.8


def test_static_quant_per_channel_act():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((64, 32)), dtype=jnp.float32)
    # per-channel varying activation magnitudes (what per-tensor can't fit)
    chan_scale = jnp.asarray(10.0 ** rng.uniform(-2, 2, 64),
                             dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, 64)),
                    dtype=jnp.float32) * chan_scale[None, :]

    lin_pc = StaticQuantLinear(w, jnp.max(jnp.abs(x), axis=0) / 127.0)
    assert lin_pc.act_per_channel
    ref = np.asarray(x @ w)
    got_pc = np.asarray(lin_pc(x))
    lin_pt = StaticQuantLinear(w, jnp.max(jnp.abs(x)) / 127.0)
    got_pt = np.asarray(lin_pt(x))
    err_pc = np.linalg.norm(got_pc - ref) / np.linalg.norm(ref)
    err_pt = np.linalg.norm(got_pt - ref) / np.linalg.norm(ref)
    assert err_pc < err_pt, (err_pc, err_pt)
    assert err_pc < 0.05


def test_static_quant_act_algo_paths():
    from neural_compressor_tpu.models import LlamaForCausalLM

    rng = np.random.default_rng(3)
    calib = [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)]

    def run_fn(m):
        for b in calib:
            m(b)

    for kwargs in (dict(act_algo="percentile", percentile=99.9),
                   dict(act_algo="mse"),
                   dict(act_granularity="per_channel")):
        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(m, nq.INT8StaticQuantConfig(**kwargs),
                         run_fn=run_fn)
        lin = qm.model.layers[0].self_attn.q_proj
        assert isinstance(lin, StaticQuantLinear)
        out = qm(calib[0])
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
