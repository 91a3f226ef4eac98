"""Fused dequant-matmul kernel vs the XLA dequantize-then-dot reference.

Mirrors the reference's analytic-expected-value test style
(test/jax/test_accuracy.py) — the Pallas kernel must match the XLA path
bit-for-bit on the same packed operands (both do f32 accumulation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_compressor_tpu.kernels import dequant_matmul_pallas, woq_matmul
from neural_compressor_tpu.ops.packing import dequantize_packed, pack_qtensor
from neural_compressor_tpu.ops.qtensor import quantize_tensor


def _mk(K=256, N=256, M=8, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.float32)
    return w, x


@pytest.mark.parametrize(
    "scheme,dtype,bits",
    [
        ("sym", "int", 4),
        ("asym", "int", 4),
        ("sym", "nf4", 4),
        ("sym", "fp4", 4),
        ("sym", "int", 2),
        ("sym", "int", 8),
        ("asym", "int", 8),
    ],
)
def test_pallas_matches_xla(scheme, dtype, bits):
    w, x = _mk()
    qt = quantize_tensor(w, bits=bits, group_size=32, scheme=scheme, dtype=dtype)
    pw = pack_qtensor(qt)
    ref = x @ dequantize_packed(pw, out_dtype=jnp.float32)
    got = dequant_matmul_pallas(x, pw, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=1e-2)


def test_ragged_m_and_3d_input():
    w, _ = _mk()
    rng = np.random.default_rng(1)
    x3 = jnp.asarray(rng.standard_normal((2, 3, 256)), dtype=jnp.float32)
    qt = quantize_tensor(w, bits=4, group_size=32)
    pw = pack_qtensor(qt)
    ref = x3 @ dequantize_packed(pw, out_dtype=jnp.float32)
    got = dequant_matmul_pallas(x3, pw, out_dtype=jnp.float32)
    assert got.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_woq_matmul_impl_dispatch():
    w, x = _mk()
    qt = quantize_tensor(w, bits=4, group_size=32)
    pw = pack_qtensor(qt)
    # xla impl runs in bf16, pallas in the activation dtype (f32 here);
    # agreement is only up to bf16 weight rounding.
    y_xla = woq_matmul(x, pw, impl="xla", out_dtype=jnp.float32)
    y_pl = woq_matmul(x, pw, impl="pallas", out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla), atol=0.3)


@pytest.mark.parametrize("scheme,bits", [("sym", 4), ("asym", 4),
                                         ("sym", 2)])
def test_vpu_matvec_matches_xla(scheme, bits):
    from neural_compressor_tpu.kernels.dequant_matmul import vpu_matvec

    w, _ = _mk(K=256, N=512)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 256)), dtype=jnp.float32)
    qt = quantize_tensor(w, bits=bits, group_size=128, scheme=scheme)
    pw = pack_qtensor(qt)
    ref = x @ dequantize_packed(pw, out_dtype=jnp.float32)
    got = vpu_matvec(x, pw, out_dtype=jnp.float32)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2,
                               rtol=1e-2)
    # M>1 and codebook dtypes decline (caller falls back)
    x2 = jnp.asarray(rng.standard_normal((2, 256)), dtype=jnp.float32)
    assert vpu_matvec(x2, pw) is None
    qt_nf = quantize_tensor(w, bits=4, group_size=128, dtype="nf4")
    assert vpu_matvec(x, pack_qtensor(qt_nf)) is None
    # 3-D single-row input works through woq_matmul impl="vpu"
    x3 = x.reshape(1, 1, 256)
    got3 = woq_matmul(x3, pw, impl="vpu", out_dtype=jnp.float32)
    assert got3.shape == (1, 1, 512)
    np.testing.assert_allclose(np.asarray(got3[0]), np.asarray(ref),
                               atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("scheme", ["sym", "asym"])
def test_vpu_matvec_int8act(scheme):
    from neural_compressor_tpu.kernels.dequant_matmul import (
        vpu_matvec_int8act)

    w, _ = _mk(K=256, N=512)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 256)), dtype=jnp.float32)
    qt = quantize_tensor(w, bits=4, group_size=128, scheme=scheme)
    pw = pack_qtensor(qt)
    ref = x @ dequantize_packed(pw, out_dtype=jnp.float32)
    got = vpu_matvec_int8act(x, pw, out_dtype=jnp.float32)
    assert got is not None
    # int8 activation quantization bounds the error (~1%)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_vpu_matvec_with_perm():
    from neural_compressor_tpu.kernels.dequant_matmul import vpu_matvec

    w, _ = _mk(K=256, N=512)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 256)), dtype=jnp.float32)
    qt = quantize_tensor(w, bits=4, group_size=128, scheme="sym")
    perm = np.concatenate([np.arange(128, 256), np.arange(0, 128)]
                          ).astype(np.int32)
    pw = pack_qtensor(qt, perm=perm)
    ref = x @ dequantize_packed(pw, out_dtype=jnp.float32)
    got = vpu_matvec(x, pw, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2,
                               rtol=1e-2)


def test_fallback_on_odd_shapes():
    # K=96 with G=32 divides, but N=96 is not a multiple of 128 -> XLA fallback
    w, _ = _mk(K=96, N=96)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 96)), dtype=jnp.float32)
    qt = quantize_tensor(w, bits=4, group_size=32)
    pw = pack_qtensor(qt)
    ref = x @ dequantize_packed(pw, out_dtype=jnp.float32)
    got = dequant_matmul_pallas(x, pw, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)
