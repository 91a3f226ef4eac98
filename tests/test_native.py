"""Native host library vs the JAX packing reference (exact match required)."""

import numpy as np
import pytest

from neural_compressor_tpu.ops import native
from neural_compressor_tpu.ops.packing import pack_codes, unpack_codes


@pytest.fixture(scope="module")
def codes():
    rng = np.random.default_rng(0)
    return rng.integers(-8, 8, (256, 128)).astype(np.int8)


def test_native_available():
    assert native.available(), "native lib should build in this image"


@pytest.mark.parametrize("bits,G", [(4, 32), (4, 128), (2, 32), (2, 64)])
def test_pack_matches_jax(codes, bits, G):
    lim = 1 << (bits - 1)
    c = np.clip(codes, -lim, lim - 1).astype(np.int8)
    native_packed = native.pack_tpu_strided(c, bits, G)
    jax_packed = np.asarray(pack_codes(c, bits, G))
    np.testing.assert_array_equal(native_packed, jax_packed)


@pytest.mark.parametrize("bits,G,signed", [(4, 32, True), (4, 32, False),
                                           (2, 64, True)])
def test_unpack_roundtrip(codes, bits, G, signed):
    lim = 1 << (bits - 1)
    c = (np.clip(codes, -lim, lim - 1) if signed
         else (codes % (1 << bits))).astype(np.int8)
    packed = native.pack_tpu_strided(c, bits, G, offset_binary=signed)
    out = native.unpack_tpu_strided(packed, bits, G, c.shape[0], signed)
    np.testing.assert_array_equal(out, c)
    # and against the jax unpacker
    jax_out = np.asarray(unpack_codes(packed, bits, G, c.shape[0],
                                      signed=signed))
    np.testing.assert_array_equal(out, jax_out)


def test_gptq_qweight_roundtrip(codes):
    c = (codes % 16).astype(np.int8)
    qw = native.pack_gptq_qweight(c, 4)
    back = native.unpack_gptq_qweight(qw, 4)
    np.testing.assert_array_equal(back, c)


def test_gptq_to_tpu_strided_fused(codes):
    c = (codes % 16).astype(np.int8)
    qw = native.pack_gptq_qweight(c, 4)
    fused = native.gptq_to_tpu_strided(qw, 4, 32)
    centered = (c.astype(np.int32) - 8).astype(np.int8)
    expected = native.pack_tpu_strided(centered, 4, 32)
    np.testing.assert_array_equal(fused, expected)


def test_numpy_fallback_matches_native(monkeypatch):
    """The numpy fallbacks must produce the SAME bytes/codes as the C++
    path (they diverged once: offset-binary landed only in C++)."""
    from neural_compressor_tpu.ops import native

    rng = np.random.default_rng(3)
    codes = rng.integers(-8, 8, (64, 16)).astype(np.int8)
    for ob in (False, True):
        ref = native.pack_tpu_strided(codes, 4, 32, offset_binary=ob)
        with monkeypatch.context() as m:
            m.setattr(native, "_load", lambda: None)
            fb = native.pack_tpu_strided(codes, 4, 32, offset_binary=ob)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fb)), ob
    packed = native.pack_tpu_strided(codes, 4, 32, offset_binary=True)
    for signed in (False, True):
        ref = native.unpack_tpu_strided(packed, 4, 32, 64, signed)
        with monkeypatch.context() as m:
            m.setattr(native, "_load", lambda: None)
            fb = native.unpack_tpu_strided(packed, 4, 32, 64, signed)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fb))
