"""Hadamard/QuaRot tests (reference test_quarot.py analog):
transform correctness, rotation orthogonality, fp equivalence of the
rotated model, and outlier flattening (incoherence reduction)."""

import jax.numpy as jnp
import numpy as np
import pytest

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.quarot import apply_quarot
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.ops.hadamard import (
    hadamard_transform,
    random_hadamard_matrix,
    random_orthogonal,
)


def test_hadamard_involution():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64)),
                    dtype=jnp.float32)
    y = hadamard_transform(hadamard_transform(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_random_hadamard_orthogonal():
    Q = random_hadamard_matrix(128, seed=1)
    np.testing.assert_allclose(np.asarray(Q @ Q.T), np.eye(128), atol=1e-5)


def test_random_orthogonal_non_pow2():
    Q = random_orthogonal(96, seed=2)
    np.testing.assert_allclose(np.asarray(Q @ Q.T), np.eye(96), atol=1e-5)


def test_quarot_fp_equivalence():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (2, 16)))
    m = LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)
    y0 = np.asarray(m(ids), dtype=np.float32)
    apply_quarot(m, seed=3)
    y1 = np.asarray(m(ids), dtype=np.float32)
    assert np.linalg.norm(y0 - y1) / np.linalg.norm(y0) < 1e-3


def test_rotation_flattens_outliers():
    # a weight with a few huge input channels: rotating the input basis
    # must reduce incoherence mu = max|W| / rms(W)
    rng = np.random.default_rng(1)
    W = rng.standard_normal((128, 64)).astype(np.float32)
    W[:4] *= 50.0
    Q = np.asarray(random_hadamard_matrix(128, seed=4))
    Wr = Q.T @ W
    mu = lambda A: np.abs(A).max() / np.sqrt((A**2).mean())
    assert mu(Wr) < mu(W) / 3


def test_quarot_then_quantize_runs():
    m = LlamaForCausalLM.from_preset("llama-test")
    apply_quarot(m, seed=5)
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 8)))
    assert qm(ids).shape == (1, 8, 256)


@pytest.mark.slow
def test_quarot_mixtral_and_deepseek_fp_equivalence():
    """Round-5 (VERDICT #7): the rotation extends beyond the llama family
    — mixtral's routed experts (+ Linear router) and deepseek's MLA
    q/kv-latent projections + raw-parameter sigmoid router + shared
    experts all fold/rotate exactly (routing decisions are preserved
    because (xR)(WR)^T == xW^T)."""
    import numpy as np
    import jax.numpy as jnp

    from neural_compressor_tpu.models.deepseek import DeepseekForCausalLM
    from neural_compressor_tpu.models.mixtral import MixtralForCausalLM

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))
    for m in (MixtralForCausalLM.from_preset("mixtral-test",
                                             dtype=jnp.float32),
              DeepseekForCausalLM.from_preset("deepseek-test",
                                              dtype=jnp.float32)):
        y0 = np.asarray(m(ids), np.float32)
        apply_quarot(m, seed=3)
        y1 = np.asarray(m(ids), np.float32)
        rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
        assert rel < 1e-4, rel
