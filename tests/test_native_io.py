"""Native checkpoint IO (ops/native_io.py + native/nq_io.cpp)."""

import json
import os

import numpy as np
import pytest

from neural_compressor_tpu.ops import native_io


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    import ml_dtypes
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("ckpt")
    rng = np.random.default_rng(0)
    t0 = {
        "layers.0.w": rng.standard_normal((64, 32)).astype(np.float32),
        "layers.0.b16": rng.standard_normal((33,)).astype(ml_dtypes.bfloat16),
        "layers.0.h16": rng.standard_normal((17,)).astype(np.float16),
        "layers.0.ids": rng.integers(0, 100, (5, 3)).astype(np.int32),
    }
    t1 = {
        "layers.1.w": rng.standard_normal((8, 8)).astype(np.float32),
        "layers.1.u8": rng.integers(0, 255, (9,)).astype(np.uint8),
    }
    save_file(t0, os.path.join(d, "model-00001.safetensors"))
    save_file(t1, os.path.join(d, "model-00002.safetensors"))
    wm = {k: "model-00001.safetensors" for k in t0}
    wm.update({k: "model-00002.safetensors" for k in t1})
    with open(os.path.join(d, "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": wm}, f)
    return str(d), {**t0, **t1}


def test_native_shard_matches_safetensors(shard_dir):
    d, ref = shard_dir
    reader = native_io.CheckpointReader(d)
    for name, want in ref.items():
        got = reader.get(name)
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got, np.float64),
                                      np.asarray(want, np.float64))
    reader.close()


def test_get_f32_widen(shard_dir):
    d, ref = shard_dir
    reader = native_io.CheckpointReader(d)
    for name, want in ref.items():
        got = reader.get_f32(name)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=0, atol=0)
    reader.close()


def test_prefetch_and_names(shard_dir):
    d, ref = shard_dir
    reader = native_io.CheckpointReader(d)
    n = reader.prefetch_prefix("layers.0.")
    if reader.native:
        assert n == 4
    assert reader.names_under("layers.1.") == sorted(
        k for k in ref if k.startswith("layers.1."))
    assert "layers.0.w" in reader
    # reads after prefetch still correct
    np.testing.assert_array_equal(reader.get("layers.1.u8"),
                                  ref["layers.1.u8"])
    reader.close()


def test_fallback_shard_equivalence(shard_dir):
    d, ref = shard_dir
    fb = native_io._FallbackShard(
        os.path.join(d, "model-00001.safetensors"))
    nat = native_io.open_shard(os.path.join(d, "model-00001.safetensors"))
    for name in fb.keys():
        np.testing.assert_array_equal(
            np.asarray(fb.get_tensor(name), np.float64),
            np.asarray(nat.get_tensor(name), np.float64))
        np.testing.assert_array_equal(fb.get_f32(name), nat.get_f32(name))
    nat.close()


def test_native_available():
    # the image has g++; the native path must actually engage here so the
    # prefetch/widen code is what the suite exercises
    from neural_compressor_tpu.ops import native

    assert native.available()


def test_f16_subnormals_widen_exactly(tmp_path):
    """IEEE f16 subnormals through the native widen (the normalize path
    had an off-by-one exponent that halved every subnormal)."""
    from safetensors.numpy import save_file

    vals = np.array([6.0e-8, 3.05e-5, 5.96e-8, -2.4e-5, 6.1e-5, 0.25, -3.0],
                    dtype=np.float16)  # subnormals + normals + zero-adjacent
    d = tmp_path / "sub"
    d.mkdir()
    save_file({"t": vals}, str(d / "model.safetensors"))
    shard = native_io.open_shard(str(d / "model.safetensors"))
    got = shard.get_f32("t")
    np.testing.assert_array_equal(got, vals.astype(np.float32))
    shard.close()
