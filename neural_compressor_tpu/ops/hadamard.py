"""Fast Walsh-Hadamard transforms and randomized rotation matrices.

Parity target: the reference's QuaRot utilities
(torch/algorithms/mixed_low_precision/custom_methods/quarot_utils.py —
which embeds ~96k LoC of literal Hadamard matrices). TPU redesign: the
transform is computed, not tabulated — a jitted log2(n) butterfly on
power-of-2 dims (the dims of every LLM we target are powers of 2 or
2^k·small); the rotation is H·diag(±1)/√n (a randomized orthogonal matrix
that provably flattens activation outliers, per the QuaRot/QuIP# papers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@functools.partial(jax.jit, static_argnames=("axis",))
def hadamard_transform(x: jax.Array, axis: int = -1) -> jax.Array:
    """Normalized fast Walsh-Hadamard transform along ``axis`` (pow2 dim)."""
    axis = axis % x.ndim
    n = x.shape[axis]
    assert _is_pow2(n), f"hadamard dim must be a power of 2, got {n}"
    perm = [a for a in range(x.ndim) if a != axis] + [axis]
    inv = [perm.index(a) for a in range(x.ndim)]
    y = jnp.transpose(x, perm).astype(jnp.float32)
    lead = y.shape[:-1]
    y = y.reshape(-1, n)
    h = 1
    while h < n:
        y = y.reshape(-1, n // (2 * h), 2, h)
        a = y[:, :, 0, :]
        b = y[:, :, 1, :]
        y = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    y = y.reshape(-1, n) / jnp.sqrt(jnp.float32(n))
    return jnp.transpose(y.reshape(*lead, n), inv).astype(x.dtype)


def random_hadamard_matrix(n: int, seed: int = 0) -> jax.Array:
    """Q = H_n · diag(s) / √n with random signs s — orthogonal (QᵀQ=I)."""
    assert _is_pow2(n), f"dim must be a power of 2, got {n}"
    signs = np.where(
        np.random.default_rng(seed).integers(0, 2, (n,)) == 1, 1.0, -1.0)
    eye = jnp.eye(n, dtype=jnp.float32) * jnp.asarray(signs, jnp.float32)
    return hadamard_transform(eye, axis=0)


def random_orthogonal(n: int, seed: int = 0) -> jax.Array:
    """Rotation for arbitrary n: randomized Hadamard when n is pow2, else a
    QR-based random orthogonal matrix."""
    if _is_pow2(n):
        return random_hadamard_matrix(n, seed)
    g = jax.random.normal(jax.random.PRNGKey(seed), (n, n), jnp.float32)
    q, r = jnp.linalg.qr(g)
    return q * jnp.sign(jnp.diagonal(r))[None, :]
