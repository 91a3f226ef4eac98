"""GPTQ tests: core column-sweep math (must beat RTN on the Hessian-weighted
objective — the algorithm's defining property), block capture machinery, and
the end-to-end prepare/calibrate/convert flow on a tiny Llama."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import (
    calibration_forward,
    find_target_blocks,
)
from neural_compressor_tpu.algorithms.gptq import gptq_quantize_matrix
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.ops.qtensor import qdq_tensor


def _correlated_problem(K=128, N=128, seed=0):
    rng = np.random.default_rng(seed)
    mix = np.eye(K) + 0.5 * rng.standard_normal((K, K))
    X = jnp.asarray(rng.standard_normal((512, K)) @ mix, dtype=jnp.float32)
    W = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.float32)
    H = 2 * X.T @ X / X.shape[0]
    return X, W, H


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("act_order", [False, True])
def test_gptq_beats_rtn_on_weighted_loss(sym, act_order):
    X, W, H = _correlated_problem()
    Wq, s, z = gptq_quantize_matrix(W, H, bits=4, group_size=32, sym=sym,
                                    act_order=act_order, block_size=64)
    err_gptq = float(jnp.linalg.norm(X @ (W - Wq)) / jnp.linalg.norm(X @ W))
    Wr = qdq_tensor(W, bits=4, group_size=32,
                    scheme="sym" if sym else "asym")
    err_rtn = float(jnp.linalg.norm(X @ (W - Wr)) / jnp.linalg.norm(X @ W))
    assert err_gptq < err_rtn


def test_gptq_scales_shapes():
    _, W, H = _correlated_problem()
    Wq, s, z = gptq_quantize_matrix(W, H, bits=4, group_size=32, sym=True,
                                    block_size=64)
    assert Wq.shape == W.shape
    assert s.shape == (128 // 32, 128)


def test_find_target_blocks():
    m = LlamaForCausalLM.from_preset("llama-test")
    found = find_target_blocks(m)
    assert found is not None
    path, blocks = found
    assert path == "model.layers"
    assert len(blocks) == 2


def test_gptq_llama_end_to_end():
    rng = np.random.default_rng(0)
    m = LlamaForCausalLM.from_preset("llama-test")
    ids = jnp.asarray(rng.integers(0, 256, (2, 16)))
    y0 = m(ids).astype(jnp.float32)
    calib = [jnp.asarray(rng.integers(0, 256, (4, 32))) for _ in range(4)]
    qm = nq.quantize(
        m, nq.GPTQConfig(dtype="int4", group_size=32, block_size=64),
        run_fn=lambda mm: calibration_forward(mm, calib))
    assert isinstance(get_module(qm, "model.layers.0.self_attn.q_proj"),
                      WOQLinear)
    y1 = qm(ids).astype(jnp.float32)
    rel = float(jnp.linalg.norm(y0 - y1) / jnp.linalg.norm(y0))
    assert rel < 0.5  # random-init tiny model; just checks sanity


def test_gptq_prepare_convert_flow():
    rng = np.random.default_rng(1)
    m = LlamaForCausalLM.from_preset("llama-test")
    calib = [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)]
    prepared = nq.prepare(m, nq.GPTQConfig(dtype="int4", group_size=32,
                                           block_size=64))
    calibration_forward(prepared, calib)
    converted = nq.convert(prepared)
    assert isinstance(
        get_module(converted, "model.layers.1.mlp.down_proj"), WOQLinear)


def test_gptq_true_sequential():
    rng = np.random.default_rng(5)
    m = LlamaForCausalLM.from_preset("llama-test")
    ids = jnp.asarray(rng.integers(0, 256, (2, 16)))
    y0 = m(ids).astype(jnp.float32)
    calib = [jnp.asarray(rng.integers(0, 256, (4, 32))) for _ in range(4)]
    qm = nq.quantize(
        m, nq.GPTQConfig(dtype="int4", group_size=32, block_size=64,
                         true_sequential=True),
        run_fn=lambda mm: calibration_forward(mm, calib))
    assert isinstance(
        get_module(qm, "model.layers.1.mlp.down_proj"), WOQLinear)
    y1 = qm(ids).astype(jnp.float32)
    rel = float(jnp.linalg.norm(y0 - y1) / jnp.linalg.norm(y0))
    assert rel < 0.5
