"""Model zoo tests: forward shapes, KV-cache/prefill consistency,
quantize-the-model flows, TP sharding on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.models import (
    GPT2Config,
    GPT2LMHeadModel,
    LlamaForCausalLM,
    make_mesh,
    shard_model,
)
from neural_compressor_tpu.models.llama import init_kv_cache


@pytest.fixture(scope="module")
def llama():
    return LlamaForCausalLM.from_preset("llama-test")


@pytest.fixture(scope="module")
def ids():
    return jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))


class TestLlama:
    def test_forward_shape(self, llama, ids):
        logits = llama(ids)
        assert logits.shape == (2, 16, 256)

    def test_kv_cache_matches_prefill(self, llama, ids):
        caches = init_kv_cache(llama.cfg, 2, 32)
        _, caches = llama(ids, caches=caches, cache_pos=0)
        pos = jnp.full((2, 1), 16)
        lg2, _ = llama(ids[:, :1], positions=pos, caches=caches, cache_pos=16)
        full = llama(jnp.concatenate([ids, ids[:, :1]], axis=1))
        np.testing.assert_allclose(
            np.asarray(full[:, -1], dtype=np.float32),
            np.asarray(lg2[:, 0], dtype=np.float32),
            atol=1e-2,
        )

    @pytest.mark.parametrize("fmt", ["int8", "fp8_e4m3"])
    def test_quant_kv_cache_decode(self, llama, ids, fmt):
        """Quantized-cache decode (int8 / fp8-e4m3) must track the bf16-cache
        decode closely at every step."""
        caches = init_kv_cache(llama.cfg, 2, 32)
        qcaches = init_kv_cache(llama.cfg, 2, 32, quantized=fmt)
        _, caches = llama(ids, caches=caches, cache_pos=0)
        _, qcaches = llama(ids, caches=qcaches, cache_pos=0)
        assert qcaches[0].fmt == fmt
        tok = ids[:, :1]
        for step in range(3):
            pos = jnp.full((2, 1), 16 + step)
            lg, caches = llama(tok, positions=pos, caches=caches,
                               cache_pos=16 + step)
            qlg, qcaches = llama(tok, positions=pos, caches=qcaches,
                                 cache_pos=16 + step)
            ref = np.asarray(lg[:, 0], dtype=np.float32)
            got = np.asarray(qlg[:, 0], dtype=np.float32)
            err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
            assert err < 0.12, f"{fmt} step {step}: rel err {err}"
            tok = jnp.argmax(lg[:, -1:], axis=-1).astype(ids.dtype)

    def test_quantize_llama_int4(self, ids):
        m = LlamaForCausalLM.from_preset("llama-test")
        y0 = m(ids).astype(jnp.float32)
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
        assert isinstance(get_module(qm, "model.layers.0.self_attn.q_proj"),
                          WOQLinear)
        # lm_head kept fp by default
        assert isinstance(qm.lm_head, nnx.Linear)
        y1 = qm(ids).astype(jnp.float32)
        # random-init tiny model: int4 error compounds over layers
        rel = float(jnp.linalg.norm(y0 - y1) / jnp.linalg.norm(y0))
        assert rel < 0.35

    def test_gqa_heads(self, llama):
        att = llama.model.layers[0].self_attn
        assert att.k_proj.out_features == 2 * llama.cfg.head_dim


class TestGPT2:
    def test_forward_and_quantize(self):
        g = GPT2LMHeadModel(
            GPT2Config(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                       n_positions=64), nnx.Rngs(0))
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (2, 8)))
        y0 = g(ids).astype(jnp.float32)
        qg = nq.quantize(g, nq.RTNConfig(dtype="int8", group_size=32))
        y1 = qg(ids).astype(jnp.float32)
        rel = float(jnp.linalg.norm(y0 - y1) / jnp.linalg.norm(y0))
        assert rel < 0.05


class TestSharding:
    def test_tp_sharded_quantized_forward(self, eight_device_mesh, ids):
        m = LlamaForCausalLM.from_preset("llama-test")
        y0 = m(ids).astype(jnp.float32)
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
        y_unsharded = qm(ids).astype(jnp.float32)
        qm = shard_model(qm, eight_device_mesh)
        pk = nnx.state(qm).flat_state()
        # packed weights of column-parallel layers must shard on 'model'
        col = [v for p, v in pk
               if "q_proj" in map(str, p) and str(p[-1]) == "packed"]
        assert col and all("model" in str(v[...].sharding.spec) for v in col)
        with eight_device_mesh:
            y1 = qm(ids).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y_unsharded),
                                   atol=5e-2)

    def test_mesh_helper(self):
        mesh = make_mesh((2, 4))
        assert mesh.shape == {"data": 2, "model": 4}


class TestGPT2Cache:
    def test_cache_matches_prefill(self):
        from neural_compressor_tpu.models.llama import init_kv_cache

        g = GPT2LMHeadModel(
            GPT2Config(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                       n_positions=64), nnx.Rngs(0))
        ids = jnp.asarray(np.random.default_rng(3).integers(0, 128, (2, 8)))
        caches = init_kv_cache(g.cfg, 2, 32)
        _, caches = g(ids, caches=caches, cache_pos=0)
        pos = jnp.full((2, 1), 8)
        lg2, _ = g(ids[:, :1], positions=pos, caches=caches, cache_pos=8)
        full = g(jnp.concatenate([ids, ids[:, :1]], axis=1))
        np.testing.assert_allclose(
            np.asarray(full[:, -1], dtype=np.float32),
            np.asarray(lg2[:, 0], dtype=np.float32), atol=1e-2)

    @pytest.mark.slow
    def test_greedy_matches_stepwise_f32(self):
        from neural_compressor_tpu.generation import greedy_search

        g = GPT2LMHeadModel(
            GPT2Config(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                       n_positions=64, dtype=jnp.float32), nnx.Rngs(0))
        ids = jnp.asarray(np.random.default_rng(4).integers(0, 128, (2, 8)))
        out = greedy_search(g, ids, max_new_tokens=4)
        cur = ids
        for _ in range(4):
            nxt = jnp.argmax(g(cur)[:, -1], axis=-1)[:, None].astype(cur.dtype)
            cur = jnp.concatenate([cur, nxt], axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(cur))


def test_build_quantized_propagates_kv_attrs():
    """Model-level attrs set by quantize entries (kv_cache_quantized /
    kv_cache_format) must survive the layer-streamed builder — they used
    to land on the per-layer holder, silently downgrading generation and
    serving to bf16 KV caches (round-4 regression)."""
    import neural_compressor_tpu as nq
    from neural_compressor_tpu.models.llama import (LLAMA_PRESETS,
                                                    LlamaConfig,
                                                    build_quantized)

    m = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama-test"]),
        nq.RTNConfig(dtype="int4", group_size=32)
        + nq.KVCacheQuantConfig(dtype="int4"))
    assert getattr(m, "kv_cache_quantized", False) is True
    assert m.kv_cache_format == "int4"


def test_chunked_prefill_attention_matches_dense():
    """Long-prefill chunked attention (positions sentinel, online
    softmax over q/kv chunks) == the dense-mask path, with and without
    a quantized cache, including ragged chunk tails."""
    import jax.numpy as jnp

    from neural_compressor_tpu.models import LlamaForCausalLM
    from neural_compressor_tpu.models import llama as L

    rng = np.random.default_rng(17)
    m = LlamaForCausalLM.from_preset("llama-test")
    ids = jnp.asarray(rng.integers(0, 256, (2, 50)))

    ref = np.asarray(m(ids), np.float32)          # dense tril path
    old = L._DENSE_MASK_ELEMS
    try:
        L.set_dense_mask_limit(64)                # force the chunked path
        got = np.asarray(m(ids), np.float32)
    finally:
        L.set_dense_mask_limit(old)
    np.testing.assert_allclose(got, ref, atol=8e-2, rtol=8e-2)

    # through an int8 cache (scales fold inside the online softmax)
    import neural_compressor_tpu as nq

    mq = nq.quantize(LlamaForCausalLM.from_preset("llama-test"),
                     nq.KVCacheQuantConfig(dtype="int8"))
    caches = mq.init_caches(2, 64) if hasattr(mq, "init_caches") else None
    from neural_compressor_tpu.models.llama import init_kv_cache

    caches = init_kv_cache(mq.cfg, 2, 64, quantized="int8")
    ref, _ = mq(ids, caches=caches, cache_pos=0)
    ref = np.asarray(ref, np.float32)
    try:
        L.set_dense_mask_limit(64)
        caches = init_kv_cache(mq.cfg, 2, 64, quantized="int8")
        got, _ = mq(ids, caches=caches, cache_pos=0)
        got = np.asarray(got, np.float32)
    finally:
        L.set_dense_mask_limit(old)
    np.testing.assert_allclose(got, ref, atol=8e-2, rtol=8e-2)


@pytest.mark.slow
def test_chunked_prefill_int4_kv_matches_dense():
    """Long-prefill chunked attention consumes PACKED int4 affine caches
    (round-5 VERDICT #8): forcing the chunked sentinel at small shapes
    must reproduce the dense int4 path's logits (same quantized codes,
    online-softmax reassociation only)."""
    import numpy as np
    import jax.numpy as jnp

    import neural_compressor_tpu as nq
    from neural_compressor_tpu.models import LlamaForCausalLM
    from neural_compressor_tpu.models.llama import (init_kv_cache,
                                                    set_dense_mask_limit)

    m = LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)
    qm = nq.quantize(m, nq.KVCacheQuantConfig(dtype="int4"))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 96)))
    caches = init_kv_cache(qm.cfg, 2, 96, quantized="int4")
    dense, _ = qm(ids, caches=caches, cache_pos=0)
    try:
        set_dense_mask_limit(96 * 96 - 1)  # force the chunked sentinel
        caches = init_kv_cache(qm.cfg, 2, 96, quantized="int4")
        chunked, _ = qm(ids, caches=caches, cache_pos=0)
    finally:
        set_dense_mask_limit(16 * 1024 * 1024)
    np.testing.assert_allclose(np.asarray(chunked, np.float32),
                               np.asarray(dense, np.float32),
                               rtol=0, atol=2e-4)


def test_chunked_prefill_int4_per_channel_k():
    """Regression (round-5 review): calibrated per-channel-K int4 KV +
    the chunked long-prefill sentinel crashed on an assert; the channel
    scales now fold into q before the chunked scan, matching the dense
    path's numerics."""
    import numpy as np
    import jax.numpy as jnp

    import neural_compressor_tpu as nq
    from neural_compressor_tpu.algorithms.calib_capture import \
        calibration_forward
    from neural_compressor_tpu.models import LlamaForCausalLM
    from neural_compressor_tpu.models.llama import (init_kv_cache,
                                                    set_dense_mask_limit)

    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)]
    m = LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)
    qm = nq.quantize(m, nq.KVCacheQuantConfig(dtype="int4",
                                              per_channel_k=True),
                     run_fn=lambda mm: calibration_forward(mm, calib))
    ids = jnp.asarray(rng.integers(0, 256, (1, 96)))
    caches = init_kv_cache(qm.cfg, 1, 96, quantized="int4")
    dense, _ = qm(ids, caches=caches, cache_pos=0)
    try:
        set_dense_mask_limit(96 * 96 - 1)
        caches = init_kv_cache(qm.cfg, 1, 96, quantized="int4")
        chunked, _ = qm(ids, caches=caches, cache_pos=0)
    finally:
        set_dense_mask_limit(16 * 1024 * 1024)
    np.testing.assert_allclose(np.asarray(chunked, np.float32),
                               np.asarray(dense, np.float32),
                               rtol=0, atol=2e-4)


def test_chunked_prefill_fp8_sdpa_close():
    """Round 5: fp8-SDPA long prefill rides the chunked online softmax
    (global per-tensor Q/K/V QDQ + per-chunk probs QDQ) instead of
    densifying to O(S*T). Forced-chunk output must track the dense fp8
    path within fp8 tolerance (the probs-QDQ order differs)."""
    import numpy as np
    import jax.numpy as jnp

    import neural_compressor_tpu as nq
    from neural_compressor_tpu.algorithms.calib_capture import \
        calibration_forward
    from neural_compressor_tpu.models import LlamaForCausalLM
    from neural_compressor_tpu.models.llama import set_dense_mask_limit

    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)]
    m = LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)
    qm = nq.quantize(m, nq.FP8Config(dump_stats_path=None,
                                     quantize_attention=True,
                                     quantize_softmax=True),
                     run_fn=lambda mm: calibration_forward(mm, calib))
    attn = qm.model.layers[0].self_attn
    assert getattr(attn, "fp8_sdpa", False)
    assert getattr(attn, "fp8_softmax", False)
    # bf16-truth reference: the same weights WITHOUT the fp8 attention
    # flags — dense-fp8 and chunked-fp8 are both e4m3 approximations of
    # it with different rounding orders, so they are compared against
    # the truth, not each other
    mref = LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)
    qref = nq.quantize(mref, nq.FP8Config(dump_stats_path=None),
                       run_fn=lambda mm: calibration_forward(mm, calib))
    ids = jnp.asarray(rng.integers(0, 256, (1, 96)))
    truth = np.asarray(qref(ids), np.float32)
    dense = np.asarray(qm(ids), np.float32)
    try:
        set_dense_mask_limit(96 * 96 - 1)
        chunked = np.asarray(qm(ids), np.float32)
    finally:
        set_dense_mask_limit(16 * 1024 * 1024)
    scale = np.abs(truth).max() + 1e-9
    e_dense = np.abs(dense - truth).max() / scale
    e_chunk = np.abs(chunked - truth).max() / scale
    # chunked-fp8 must approximate the truth about as well as dense-fp8
    assert e_chunk < max(2.0 * e_dense, 0.05), (e_chunk, e_dense)
