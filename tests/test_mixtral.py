"""Mixtral MoE model tests: routing correctness, quantization of experts
(reference MoE parity: PatchedMixtralMoE, helper_modules.py:655-1103),
router kept fp by default."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.models import MixtralForCausalLM


@pytest.fixture(scope="module")
def mixtral():
    return MixtralForCausalLM.from_preset("mixtral-test")


@pytest.fixture
def ids():
    return jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))


def test_forward(mixtral, ids):
    y = mixtral(ids)
    assert y.shape == (2, 12, 256)


def test_topk_weights_sum_to_one(mixtral, ids):
    moe = mixtral.layers[0].block_sparse_moe
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 128)),
                    dtype=jnp.bfloat16)
    logits = moe.gate(x).astype(jnp.float32)
    topv, _ = __import__("jax").lax.top_k(logits, moe.cfg.num_experts_per_tok)
    w = __import__("jax").nn.softmax(topv, axis=-1)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_quantize_experts_router_kept_fp(ids):
    m = MixtralForCausalLM.from_preset("mixtral-test")
    y0 = m(ids).astype(jnp.float32)
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    assert isinstance(
        get_module(qm, "layers.0.block_sparse_moe.experts.0.w1"), WOQLinear)
    # router gate must stay a plain Linear
    assert isinstance(
        get_module(qm, "layers.0.block_sparse_moe.gate"), nnx.Linear)
    y1 = qm(ids).astype(jnp.float32)
    rel = float(jnp.linalg.norm(y0 - y1) / jnp.linalg.norm(y0))
    assert rel < 0.4


def test_gptq_on_mixtral(ids):
    from neural_compressor_tpu.algorithms.calib_capture import (
        calibration_forward,
    )

    rng = np.random.default_rng(2)
    calib = [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)]
    m = MixtralForCausalLM.from_preset("mixtral-test")
    qm = nq.quantize(
        m, nq.GPTQConfig(dtype="int4", group_size=32, block_size=64),
        run_fn=lambda mm: calibration_forward(mm, calib))
    assert isinstance(
        get_module(qm, "layers.1.block_sparse_moe.experts.1.w2"), WOQLinear)


@pytest.mark.slow
def test_hf_mixtral_import_exact(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import (
        MixtralConfig as HFCfg,
        MixtralForCausalLM as HFMix,
    )

    from neural_compressor_tpu.models.hf_import import load_hf_mixtral

    cfg = HFCfg(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, num_local_experts=4,
                num_experts_per_tok=2, max_position_embeddings=128)
    hm = HFMix(cfg).eval().float()
    d = str(tmp_path / "hf_mixtral")
    hm.save_pretrained(d, safe_serialization=True)
    ids = np.random.default_rng(0).integers(0, 256, (2, 10))
    with torch.no_grad():
        y_t = hm(torch.tensor(ids)).logits.numpy()
    jm = load_hf_mixtral(d, dtype=jnp.float32)
    y_j = np.asarray(jm(jnp.asarray(ids)), dtype=np.float32)
    np.testing.assert_allclose(y_t, y_j, atol=1e-4)


@pytest.mark.slow
class TestStackedMoE:
    def test_stacked_matches_dense_fp(self):
        import numpy as np
        import jax.numpy as jnp
        from neural_compressor_tpu.models import MixtralForCausalLM
        from neural_compressor_tpu.models.mixtral import (
            StackedMoEBlock, stack_experts_for_serving)

        m = MixtralForCausalLM.from_preset("mixtral-test")
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))
        y0 = np.asarray(m(ids), np.float32)
        n = stack_experts_for_serving(m, capacity_factor=8.0)  # no drops
        assert n == 2
        assert isinstance(m.layers[0].block_sparse_moe, StackedMoEBlock)
        y1 = np.asarray(m(ids), np.float32)
        np.testing.assert_allclose(y1, y0, atol=3e-2, rtol=3e-2)

    def test_stacked_quantized_and_ep_sharded(self, eight_device_mesh):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        import neural_compressor_tpu as nq
        from neural_compressor_tpu.models import (MixtralForCausalLM,
                                                  make_mesh, shard_model)
        from neural_compressor_tpu.models.mixtral import (
            StackedMoEBlock, stack_experts_for_serving)

        m = nq.quantize(
            MixtralForCausalLM.from_preset(
                "mixtral-test", num_local_experts=8),
            nq.RTNConfig(dtype="int4", group_size=32))
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)))
        y0 = np.asarray(m(ids), np.float32)
        n = stack_experts_for_serving(m, capacity_factor=8.0)
        assert n == 2
        blk = m.layers[0].block_sparse_moe
        assert blk.quantized
        y1 = np.asarray(m(ids), np.float32)
        np.testing.assert_allclose(y1, y0, atol=3e-2, rtol=3e-2)
        # EP: the expert axis shards over the model axis
        mesh = make_mesh((1, 8))
        m = shard_model(m, mesh)
        spec = blk.w1s[...].sharding.spec
        assert len(spec) >= 1 and spec[0] == "model", spec
        with mesh:
            y2 = np.asarray(jax.device_get(m(ids)), np.float32)
        np.testing.assert_allclose(y2, y1, atol=3e-2, rtol=3e-2)


@pytest.mark.slow
def test_mixtral_int4_kv_decode():
    """MoE decode through the packed-int4 KV cache (LlamaAttention is
    shared, so the format flows through every family)."""
    import numpy as np
    import jax.numpy as jnp

    from neural_compressor_tpu.models.llama import init_kv_cache
    from neural_compressor_tpu.models.mixtral import (
        MixtralConfig, MixtralForCausalLM)
    from flax import nnx

    cfg = MixtralConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        num_local_experts=4, num_experts_per_tok=2,
                        max_position_embeddings=64, dtype=jnp.float32)
    m = MixtralForCausalLM(cfg, nnx.Rngs(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 8)))
    caches = init_kv_cache(cfg, 2, 16, quantized="int4")
    assert caches[0].k_codes.dtype == jnp.uint8
    _, caches = m(ids, caches=caches, cache_pos=0)
    step, _ = m(ids[:, :1], positions=jnp.full((2, 1), 8), caches=caches,
                cache_pos=8)
    full = m(jnp.concatenate([ids, ids[:, :1]], axis=1))
    # plumbing check: int4 noise on random-init weights is large
    # (accuracy is asserted on the trained LM in test_accuracy_parity)
    err = np.abs(np.asarray(step[:, 0]) - np.asarray(full[:, 8])).max()
    scale = np.abs(np.asarray(full[:, 8])).max() + 1e-9
    assert err / scale < 0.3, err / scale


def test_chunked_prefill_matches_dense_moe():
    """Mixtral rides llama's chunked-attention sentinel: long-prefill
    forward == dense-mask forward (routing unaffected — the mask only
    enters attention)."""
    import jax.numpy as jnp
    import numpy as np

    from neural_compressor_tpu.models import llama as L
    from neural_compressor_tpu.models.mixtral import MixtralForCausalLM

    ids = jnp.asarray(np.random.default_rng(11).integers(0, 256, (2, 40)))
    m = MixtralForCausalLM.from_preset("mixtral-test")
    ref = np.asarray(m(ids), np.float32)
    old = L._DENSE_MASK_ELEMS
    try:
        L.set_dense_mask_limit(64)
        got = np.asarray(m(ids), np.float32)
    finally:
        L.set_dense_mask_limit(old)
    np.testing.assert_allclose(got, ref, atol=8e-2, rtol=8e-2)
