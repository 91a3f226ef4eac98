"""Keras-3 frontend adapter tests (reference JAX/Keras frontend parity)."""

import numpy as np
import pytest

keras = pytest.importorskip("keras")

import neural_compressor_tpu as nq
from neural_compressor_tpu.keras_api import quantize_model


@pytest.fixture(autouse=True)
def _jax_backend(monkeypatch):
    if keras.backend.backend() != "jax":
        pytest.skip("needs KERAS_BACKEND=jax")


def _model():
    return keras.Sequential([
        keras.layers.Input((64,)),
        keras.layers.Dense(128, activation="relu"),
        keras.layers.Dense(10),
    ])


def test_woq_qdq_inplace():
    m = _model()
    x = np.random.default_rng(0).standard_normal((8, 64)).astype("float32")
    y0 = np.asarray(m(x))
    qm = quantize_model(m, nq.RTNConfig(dtype="int8", group_size=32))
    y1 = np.asarray(qm(x))
    assert np.linalg.norm(y0 - y1) / np.linalg.norm(y0) < 0.02


def test_static_int8():
    m = _model()
    x = np.random.default_rng(1).standard_normal((8, 64)).astype("float32")
    y0 = np.asarray(m(x))
    qm = quantize_model(m, nq.INT8StaticQuantConfig(),
                        calib_function=lambda mm: mm(x))
    y1 = np.asarray(qm(x))
    assert np.linalg.norm(y0 - y1) / np.linalg.norm(y0) < 0.05
