"""shard_map TP quantized matmuls: column/row-parallel vs the single-device
reference, including the pallas kernel running per shard."""

import jax.numpy as jnp
import numpy as np
import pytest

from neural_compressor_tpu.kernels.tp_matmul import (
    tp_woq_matmul_column,
    tp_woq_matmul_row,
)
from neural_compressor_tpu.models import make_mesh
from neural_compressor_tpu.ops.packing import dequantize_packed, pack_qtensor
from neural_compressor_tpu.ops.qtensor import quantize_tensor


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    K = N = 256
    w = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, K)), dtype=jnp.float32)
    pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=32))
    ref = np.asarray(x @ dequantize_packed(pw, out_dtype=jnp.float32))
    return x, pw, ref


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_column_parallel(problem, eight_device_mesh, impl):
    x, pw, ref = problem
    mesh = make_mesh((1, 8))
    with mesh:
        y = np.asarray(tp_woq_matmul_column(x, pw, mesh, impl=impl),
                       dtype=np.float32)
    np.testing.assert_allclose(y, ref, atol=1e-2)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_row_parallel_psum(problem, eight_device_mesh, impl):
    x, pw, ref = problem
    mesh = make_mesh((1, 8))
    with mesh:
        y = np.asarray(tp_woq_matmul_row(x, pw, mesh, impl=impl),
                       dtype=np.float32)
    np.testing.assert_allclose(y, ref, atol=1e-2)


def test_row_parallel_asym(problem, eight_device_mesh):
    rng = np.random.default_rng(1)
    K = N = 256
    w = jnp.asarray(rng.standard_normal((K, N)) + 2.0, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, K)), dtype=jnp.float32)
    pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=32,
                                      scheme="asym"))
    ref = np.asarray(x @ dequantize_packed(pw, out_dtype=jnp.float32))
    mesh = make_mesh((1, 8))
    with mesh:
        y = np.asarray(tp_woq_matmul_row(x, pw, mesh, impl="xla"),
                       dtype=np.float32)
    np.testing.assert_allclose(y, ref, atol=1e-2)
