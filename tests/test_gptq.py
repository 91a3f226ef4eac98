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
    Wq, s, z, _perm, _f8 = gptq_quantize_matrix(
        W, H, bits=4, group_size=32, sym=sym, act_order=act_order,
        block_size=64)
    err_gptq = float(jnp.linalg.norm(X @ (W - Wq)) / jnp.linalg.norm(X @ W))
    Wr = qdq_tensor(W, bits=4, group_size=32,
                    scheme="sym" if sym else "asym")
    err_rtn = float(jnp.linalg.norm(X @ (W - Wr)) / jnp.linalg.norm(X @ W))
    assert err_gptq < err_rtn


def test_gptq_scales_shapes():
    _, W, H = _correlated_problem()
    Wq, s, z, _perm, _f8 = gptq_quantize_matrix(W, H, bits=4, group_size=32,
                                                sym=True, block_size=64)
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


def test_gptq_hybrid_order_gar():
    """GAR (hybrid_order) must return a group-preserving permutation and
    beat RTN on the weighted loss; dequantization must honor the perm."""
    X, W, H = _correlated_problem()
    Wq, s, z, perm, _f8 = gptq_quantize_matrix(
        W, H, bits=4, group_size=32, sym=True, block_size=64,
        hybrid_order=True)
    assert perm is not None
    p = np.asarray(perm)
    assert sorted(p.tolist()) == list(range(128))
    # groups stay intact: each contiguous 32-chunk of perm maps one group
    assert all(len({v // 32 for v in p[i:i + 32]}) == 1
               for i in range(0, 128, 32))
    # Wq is in permuted order; un-permute and check weighted loss vs RTN
    Wq_orig = np.zeros_like(np.asarray(Wq))
    Wq_orig[p] = np.asarray(Wq)
    err_gar = float(jnp.linalg.norm(X @ (W - Wq_orig)) /
                    jnp.linalg.norm(X @ W))
    Wr = qdq_tensor(W, bits=4, group_size=32, scheme="sym")
    err_rtn = float(jnp.linalg.norm(X @ (W - Wr)) / jnp.linalg.norm(X @ W))
    assert err_gar < err_rtn


def test_gptq_hybrid_order_module_forward():
    """A WOQLinear built with a perm must match the un-permuted dequant."""
    from neural_compressor_tpu.algorithms.gptq import gptq_layer_to_woq

    X, W, H = _correlated_problem()

    class Cfg:
        weight_bits = 4
        group_size = 32
        use_sym = True
        scheme = "sym"
        act_order = False
        percdamp = 0.01
        block_size = 64
        static_groups = False
        hybrid_order = True
        fp8_aware = False

    lin = gptq_layer_to_woq(W, H, Cfg())
    assert lin.perm is not None
    y = lin(X[:4])
    wk = lin.dequantized_kernel()  # original row order
    ref = X[:4] @ wk
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gptq_fp8_aware_protective_range():
    """fp8_aware QDQ values must lie on the e4m3 grid within the protective
    range after dividing by the bf16->fp8 scale, and differ from plain."""
    _X, W, H = _correlated_problem()
    Wq, s, z, _p, f8 = gptq_quantize_matrix(
        W, H, bits=4, group_size=32, sym=True, block_size=64, fp8_aware=True)
    Wq_plain, *_ = gptq_quantize_matrix(
        W, H, bits=4, group_size=32, sym=True, block_size=64)
    assert float(f8) > 0 and np.log2(float(f8)) == int(np.log2(float(f8)))
    w8 = np.asarray(Wq, np.float32) / float(f8)
    snapped = np.asarray(
        jnp.asarray(w8).astype(jnp.float8_e4m3fn).astype(jnp.float32))
    np.testing.assert_allclose(w8, snapped, rtol=0, atol=0)
    protective = 448.0 - 448.0 / 7
    assert np.max(np.abs(w8)) <= protective
    assert not np.allclose(np.asarray(Wq), np.asarray(Wq_plain))


def test_gptq_quant_lm_head():
    rng = np.random.default_rng(7)
    m = LlamaForCausalLM.from_preset("llama-test")
    calib = [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)]
    qm = nq.quantize(
        m, nq.GPTQConfig(dtype="int4", group_size=32, block_size=64,
                         quant_lm_head=True),
        run_fn=lambda mm: calibration_forward(mm, calib))
    assert isinstance(get_module(qm, "lm_head"), WOQLinear)
    ids = jnp.asarray(rng.integers(0, 256, (2, 8)))
    assert np.isfinite(np.asarray(qm(ids), dtype=np.float32)).all()


def test_gptq_act_order_checkpoint_roundtrip(tmp_path):
    """Export with a perm (act-order layout) -> optimum tensors -> import
    must reproduce the dequantized weight exactly."""
    from neural_compressor_tpu.ops.packing import (
        dequantize_packed, from_gptq_layout, pack_qtensor, to_gptq_layout)
    from neural_compressor_tpu.ops.qtensor import quantize_tensor

    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.standard_normal((128, 64)), dtype=jnp.float32)
    qt = quantize_tensor(W, bits=4, group_size=32, scheme="asym")
    # fabricate a group-preserving row permutation (like GAR/act-order)
    perm = np.concatenate([rng.permutation(np.arange(g * 32, (g + 1) * 32))
                           for g in rng.permutation(4)]).astype(np.int32)
    # store codes permuted so that stored row i = original row perm[i]
    codes_perm = np.asarray(qt.codes)[perm]
    # regroup scales to match the permuted group order
    gorder = perm[::32] // 32
    qt2 = qt._replace(codes=jnp.asarray(codes_perm),
                      scales=qt.scales[gorder], zeros=qt.zeros[gorder])
    pw = pack_qtensor(qt2, perm=perm)
    w_ref = np.asarray(dequantize_packed(pw, out_dtype=jnp.float32))
    gl = to_gptq_layout(pw)
    assert not np.array_equal(gl["g_idx"], np.arange(128) // 32)
    pw2 = from_gptq_layout(gl["qweight"], gl["qzeros"], gl["scales"],
                           gl["g_idx"], bits=4, sym=False)
    assert pw2.perm is not None
    w_back = np.asarray(dequantize_packed(pw2, out_dtype=jnp.float32))
    np.testing.assert_allclose(w_back, w_ref, rtol=1e-2, atol=1e-3)
    # and the matmul honors the permutation (vs dequantized original order)
    x = jnp.asarray(rng.standard_normal((4, 128)), dtype=jnp.float32)
    from neural_compressor_tpu.kernels import woq_matmul
    y = np.asarray(woq_matmul(x, pw2, impl="xla"))
    np.testing.assert_allclose(y, x @ w_ref, rtol=1e-2, atol=1e-2)


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


def test_gptq_ragged_k_pads():
    # K not a multiple of group_size used to crash the static-groups
    # reshape; it now pads with dead input dims like the rest of the stack
    from neural_compressor_tpu.algorithms.gptq import gptq_layer_to_woq
    X, W, H = _correlated_problem(K=80, N=64, seed=3)
    cfg = nq.GPTQConfig(dtype="int4", group_size=32)
    lin = gptq_layer_to_woq(W, H, cfg)
    assert isinstance(lin, WOQLinear)
    y = lin(X).astype(jnp.float32)
    ref = X @ W
    assert float(jnp.linalg.norm(ref - y) / jnp.linalg.norm(ref)) < 0.2


@pytest.mark.parametrize("wdtype", ["nf4", "fp4"])
def test_gptq_codebook_dtype(wdtype):
    # nf4/fp4 configs used to silently run the int sweep; the codebook now
    # drives the column QDQ, and error feedback must beat codebook RTN
    from neural_compressor_tpu.algorithms.gptq import gptq_layer_to_woq
    X, W, H = _correlated_problem(seed=4)
    cfg = nq.GPTQConfig(dtype=wdtype, group_size=32)
    lin = gptq_layer_to_woq(W, H, cfg)
    assert lin.wdtype == wdtype
    ref = X @ W
    err_gptq = float(jnp.linalg.norm(ref - lin(X).astype(jnp.float32))
                     / jnp.linalg.norm(ref))
    Wr = qdq_tensor(W, group_size=32, dtype=wdtype)
    err_rtn = float(jnp.linalg.norm(X @ (W - Wr)) / jnp.linalg.norm(ref))
    assert err_gptq < err_rtn
