"""End-to-end quantize() API tests on tiny NNX models — the dominant test
pattern of the reference (tiny in-test model → quantize → assert module
replacement + output closeness, e.g. test/torch/quantization/weight_only/
test_rtn.py:63-80)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import (
    get_model_info,
    get_module,
    named_modules,
    replace_module,
)


class TinyMLP(nnx.Module):
    def __init__(self, rngs, din=64, dh=128):
        self.fc1 = nnx.Linear(din, dh, rngs=rngs)
        self.fc2 = nnx.Linear(dh, din, rngs=rngs)
        self.blocks = nnx.List([nnx.Linear(din, din, rngs=rngs) for _ in range(2)])
        self.lm_head = nnx.Linear(din, 100, rngs=rngs)

    def __call__(self, x):
        x = nnx.relu(self.fc1(x))
        x = nnx.relu(self.fc2(x))
        for b in self.blocks:
            x = nnx.relu(b(x))
        return self.lm_head(x)


@pytest.fixture
def model():
    return TinyMLP(nnx.Rngs(0))


@pytest.fixture
def x():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 64)), dtype=jnp.float32)


class TestModuleUtils:
    def test_named_modules_and_replace(self, model):
        names = [n for n, _ in named_modules(model)]
        assert "blocks.0" in names and "fc1" in names
        lin = get_module(model, "blocks.1")
        assert isinstance(lin, nnx.Linear)
        replace_module(model, "blocks.1", nnx.Linear(64, 64, rngs=nnx.Rngs(1)))
        assert get_module(model, "blocks.1") is not lin

    def test_get_model_info(self, model):
        info = get_model_info(model, ("Linear",))
        assert ("fc1", "Linear") in info
        assert len(info) == 5


class TestRTN:
    def test_int4_replaces_and_close(self, model, x):
        y_ref = model(x)
        qm = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=32))
        # lm_head untouched by default (quant_lm_head=False)
        assert isinstance(get_module(qm, "lm_head"), nnx.Linear)
        assert isinstance(get_module(qm, "fc1"), WOQLinear)
        y_q = qm(x)
        # int4 weight QDQ error (~10%/layer) compounds over 4 random layers
        rel = float(jnp.linalg.norm(y_ref - y_q) / jnp.linalg.norm(y_ref))
        assert rel < 0.3

    def test_quant_lm_head(self, x):
        m = TinyMLP(nnx.Rngs(0))
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", quant_lm_head=True))
        assert isinstance(get_module(qm, "lm_head"), WOQLinear)

    def test_int8_high_accuracy(self, model, x):
        y_ref = model(x)
        qm = nq.quantize(model, nq.RTNConfig(dtype="int8", group_size=32))
        y_q = qm(x)
        rel = float(jnp.linalg.norm(y_ref - y_q) / jnp.linalg.norm(y_ref))
        assert rel < 0.03

    def test_local_op_override(self, x):
        m = TinyMLP(nnx.Rngs(0))
        cfg = nq.RTNConfig(dtype="int8")
        cfg.set_local("fc1", nq.RTNConfig(dtype="int4", group_size=32))
        qm = nq.quantize(m, cfg)
        assert get_module(qm, "fc1").bits == 4
        assert get_module(qm, "fc2").bits == 8

    def test_explicit_bits_wins_over_default_dtype(self, model, x):
        """RTNConfig(bits=8) used to quantize at 4 bits: the default
        dtype="int4" silently overrode the explicit bits (weight_bits
        preferred the dtype width). Whichever field moved off its default
        wins; two conflicting non-default values raise."""
        y_ref = model(x)
        qm = nq.quantize(model, nq.RTNConfig(bits=8, group_size=32))
        assert get_module(qm, "fc1").bits == 8
        y_q = qm(x)
        rel = float(jnp.linalg.norm(y_ref - y_q) / jnp.linalg.norm(y_ref))
        assert rel < 0.03  # int8-level, not int4-level
        with pytest.raises(ValueError):
            _ = nq.RTNConfig(dtype="int8", bits=3).weight_bits
        with pytest.raises(ValueError):
            _ = nq.RTNConfig(dtype="nf4", bits=8).weight_bits
        assert nq.RTNConfig(dtype="int2").weight_bits == 2

    def test_mse_search(self, model, x):
        qm = nq.quantize(
            model, nq.RTNConfig(dtype="int4", group_size=32, use_mse_search=True))
        assert isinstance(get_module(qm, "fc1"), WOQLinear)

    def test_nf4(self, model, x):
        y_ref = model(x)
        qm = nq.quantize(model, nq.RTNConfig(dtype="nf4", group_size=32))
        y_q = qm(x)
        rel = float(jnp.linalg.norm(y_ref - y_q) / jnp.linalg.norm(y_ref))
        assert rel < 0.3

    def test_nnx_jit_forward(self, model, x):
        qm = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=32))
        y_eager = qm(x)

        @nnx.jit
        def fwd(m, x):
            return m(x)

        y_jit = fwd(qm, x)
        np.testing.assert_allclose(
            np.asarray(y_jit), np.asarray(y_eager), atol=1e-3)
