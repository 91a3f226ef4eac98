"""Sharded checkpoint save + cross-mesh restore (the reference's TP
re-sharding capability, fp8_quant/save_load.py:724-919, redone via
orbax/tensorstore global checkpoints)."""

import numpy as np
import pytest

import jax.numpy as jnp

import neural_compressor_tpu as nq
from neural_compressor_tpu.models import LlamaForCausalLM, make_mesh, shard_model
from neural_compressor_tpu.quantization.distributed_checkpoint import (
    load_sharded,
    save_sharded,
)


@pytest.mark.slow
def test_save_and_cross_mesh_restore(tmp_path, eight_device_mesh):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (2, 16)))
    m = LlamaForCausalLM.from_preset("llama-test")
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    mesh24 = make_mesh((2, 4))
    qm = shard_model(qm, mesh24)
    with mesh24:
        y0 = np.asarray(qm(ids), dtype=np.float32)
    path = str(tmp_path / "ckpt")
    save_sharded(qm, path)

    # restore into a fresh skeleton on a DIFFERENT mesh ("world size" change)
    m2 = nq.quantize(LlamaForCausalLM.from_preset("llama-test", seed=3),
                     nq.RTNConfig(dtype="int4", group_size=32))
    mesh42 = make_mesh((4, 2))
    m2 = load_sharded(path, m2, mesh=mesh42)
    with mesh42:
        y1 = np.asarray(m2(ids), dtype=np.float32)
    # different TP width changes the psum reduction order (bf16) — small
    # numeric noise is expected, the restore itself is exact
    np.testing.assert_allclose(y1, y0, atol=0.05)

    # packed weights must actually be sharded on the new mesh
    from flax import nnx

    flat = nnx.state(m2).flat_state()
    packed = [v for p, v in flat if str(p[-1]) == "packed"]
    assert packed and any("model" in str(v[...].sharding.spec)
                          for v in packed)


@pytest.mark.slow
def test_restore_without_mesh(tmp_path):
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 256, (1, 8)))
    m = nq.quantize(LlamaForCausalLM.from_preset("llama-test"),
                    nq.RTNConfig(dtype="int8", group_size=32))
    y0 = np.asarray(m(ids), dtype=np.float32)
    path = str(tmp_path / "ckpt2")
    save_sharded(m, path)
    m2 = nq.quantize(LlamaForCausalLM.from_preset("llama-test", seed=5),
                     nq.RTNConfig(dtype="int8", group_size=32))
    m2 = load_sharded(path, m2)
    y1 = np.asarray(m2(ids), dtype=np.float32)
    np.testing.assert_allclose(y1, y0, atol=1e-3)
