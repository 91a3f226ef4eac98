"""DeepSeek-V3 family: MLA + sigmoid-routed group-limited MoE with shared
experts — HF numerical parity on a tiny random checkpoint, cache-decode
consistency, and quantize+generate (reference coverage: the FP8/EP stack's
PatchedGaudiDeepseekV3MoE, helper_modules.py:815)."""

import numpy as np
import pytest
import jax.numpy as jnp

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import named_modules
from neural_compressor_tpu.models import DeepseekForCausalLM
from neural_compressor_tpu.models.hf_import import (
    detect_architecture, load_hf_model)


def _tiny_hf(tmp_path, **over):
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(0)
    kw = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
              moe_intermediate_size=32, num_hidden_layers=3,
              num_attention_heads=4, num_key_value_heads=4,
              q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
              qk_nope_head_dim=8, v_head_dim=16, n_routed_experts=8,
              num_experts_per_tok=2, n_shared_experts=1, n_group=4,
              topk_group=2, first_k_dense_replace=1,
              max_position_embeddings=64)
    kw.update(over)
    m = DeepseekV3ForCausalLM(DeepseekV3Config(**kw)).eval().float()
    d = tmp_path / "dsv3"
    m.save_pretrained(d, safe_serialization=True)
    return m, str(d)


@pytest.mark.slow
def test_deepseek_hf_parity(tmp_path):
    """MLA low-rank q/kv paths, shared rope key, interleaved rotary, and
    the bias-corrected group-limited router all reproduce HF numerics."""
    import torch

    hf_model, d = _tiny_hf(tmp_path)
    assert detect_architecture(d) == "deepseek"
    model = load_hf_model(d, dtype=jnp.float32)
    assert model.cfg.rope_interleave
    # layer 0 is dense (first_k_dense_replace=1), layers 1-2 are MoE
    assert not hasattr(model.model.layers[0].mlp, "experts")
    assert len(model.model.layers[1].mlp.experts) == 8
    ids = np.random.default_rng(0).integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"deepseek: max logit diff {err}"


@pytest.mark.slow
def test_deepseek_hf_parity_no_qlora_halfrope(tmp_path):
    """q_lora_rank=None (direct q_proj) and non-interleaved rotary."""
    import torch

    hf_model, d = _tiny_hf(tmp_path, q_lora_rank=None, rope_interleave=False)
    model = load_hf_model(d, dtype=jnp.float32)
    assert model.model.layers[0].self_attn.q_proj is not None
    ids = np.random.default_rng(1).integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"deepseek(no-qlora): max logit diff {err}"


@pytest.mark.slow
def test_cache_matches_prefill():
    m = DeepseekForCausalLM.from_preset("deepseek-test")
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 8)))
    caches = m.init_caches(2, 16)
    assert caches[0].k.shape[-1] == m.cfg.qk_head_dim
    assert caches[0].v.shape[-1] == m.cfg.v_head_dim
    _, caches = m(ids, caches=caches, cache_pos=0)
    pos = jnp.full((2, 1), 8)
    lg2, _ = m(ids[:, :1], positions=pos, caches=caches, cache_pos=8)
    full = m(jnp.concatenate([ids, ids[:, :1]], axis=1))
    np.testing.assert_allclose(
        np.asarray(full[:, -1], dtype=np.float32),
        np.asarray(lg2[:, 0], dtype=np.float32), atol=2e-2)


def test_quantize_and_generate_router_stays_fp():
    from neural_compressor_tpu.generation import greedy_search
    from neural_compressor_tpu.models.deepseek import DeepseekTopkRouter

    m = DeepseekForCausalLM.from_preset("deepseek-test")
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (1, 8)))
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    n_woq = sum(1 for _p, mod in named_modules(qm)
                if isinstance(mod, WOQLinear))
    # 2 MoE layers x (8 experts + shared) x 3 projections quantize, plus
    # the MLA factors; the raw-parameter router is never a target
    assert n_woq >= 2 * 9 * 3
    for _p, mod in named_modules(qm):
        if isinstance(mod, DeepseekTopkRouter):
            assert mod.weight[...].dtype == jnp.float32
    out = greedy_search(qm, ids, max_new_tokens=4)
    assert out.shape == (1, 12)


def test_latent_cache_matches_expanded():
    """Absorbed-MLA decode over the [B,1,T,r+dr] latent cache reproduces
    the expanded per-head K/V decode — in fp AND on a quantized model
    (the absorption dequantizes the quantized kv_b, so quantization error
    is shared, not compounded)."""
    from neural_compressor_tpu.models import enable_mla_latent_cache
    from neural_compressor_tpu.models.deepseek import LatentKVCache

    ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, (2, 8)))
    pos = jnp.full((2, 1), 8)
    for quantize in (False, True):
        m = DeepseekForCausalLM.from_preset("deepseek-test",
                                            dtype=jnp.float32)
        if quantize:
            m = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
        caches = m.init_caches(2, 16)
        _, caches = m(ids, caches=caches, cache_pos=0)
        ref, _ = m(ids[:, :1], positions=pos, caches=caches, cache_pos=8)

        assert enable_mla_latent_cache(m) == m.cfg.num_hidden_layers
        lcaches = m.init_caches(2, 16)
        assert isinstance(lcaches[0], LatentKVCache)
        assert lcaches[0].lat.shape == (
            2, 1, 16, m.cfg.kv_lora_rank + m.cfg.qk_rope_head_dim)
        _, lcaches = m(ids, caches=lcaches, cache_pos=0)
        got, _ = m(ids[:, :1], positions=pos, caches=lcaches, cache_pos=8)
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(got, np.float32),
                                   atol=5e-4, err_msg=f"quantize={quantize}")


def test_latent_cache_greedy_equivalence():
    """greedy_search through the model-provided latent caches emits the
    same tokens as the expanded-cache run."""
    from neural_compressor_tpu.generation import greedy_search
    from neural_compressor_tpu.models import enable_mla_latent_cache

    ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, (1, 8)))
    m = DeepseekForCausalLM.from_preset("deepseek-test", dtype=jnp.float32)
    ref = greedy_search(m, ids, max_new_tokens=6)
    enable_mla_latent_cache(m)
    got = greedy_search(m, ids, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.slow
def test_deepseek_yarn_hf_parity(tmp_path):
    """YaRN long-context scaling: the band-interpolated inv_freq AND the
    mscale^2 attention-scale correction both reproduce HF numerics (the
    production deepseek-v3 checkpoints ship factor-40 yarn)."""
    import torch

    hf_model, d = _tiny_hf(
        tmp_path,
        max_position_embeddings=64,
        rope_scaling={"type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 16,
                      "mscale": 1.0, "mscale_all_dim": 1.0,
                      "beta_fast": 32, "beta_slow": 1})
    model = load_hf_model(d, dtype=jnp.float32)
    assert model.cfg.rope_scaling["type"] == "yarn"
    assert model.cfg.attn_scale != pytest.approx(
        model.cfg.qk_head_dim ** -0.5)  # mscale^2 correction active
    # positions past the original 16-token context exercise the scaled
    # bands
    ids = np.random.default_rng(6).integers(0, 128, (2, 24))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"deepseek yarn: max logit diff {err}"


@pytest.mark.slow
def test_qwen2_yarn_hf_parity(tmp_path):
    """yarn through the llama-family loader (qwen long-context configs)."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
        rope_scaling={"rope_type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 16})
    hf_model = transformers.Qwen2ForCausalLM(cfg).eval().float()
    d = tmp_path / "qwen2-yarn"
    hf_model.save_pretrained(d, safe_serialization=True)
    model = load_hf_model(str(d), dtype=jnp.float32)
    ids = np.random.default_rng(7).integers(0, 128, (2, 24))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)), dtype=np.float32)
    err = np.abs(ref - got).max()
    assert err < 5e-3, f"qwen2 yarn: max logit diff {err}"


@pytest.mark.parametrize("quantize", [False, True],
                         ids=["fp", "int4"])
def test_stacked_moe_serving_matches_dense(quantize):
    """stack_experts_for_serving converts deepseek's MoE to the sparse
    capacity-dispatch stacked form (EP-shardable [E, ...] kernels): with
    enough capacity the routed+shared output equals the dense block."""
    from neural_compressor_tpu.models.mixtral import (
        StackedMoEBlock, stack_experts_for_serving)

    m = DeepseekForCausalLM.from_preset("deepseek-test", dtype=jnp.float32)
    if quantize:
        m = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    ids = jnp.asarray(np.random.default_rng(8).integers(0, 256, (2, 8)))
    ref = np.asarray(m(ids), np.float32)
    # 2 MoE layers (layer 0 is dense by first_k_dense_replace)
    assert stack_experts_for_serving(m, capacity_factor=8.0) == 2
    blk = m.model.layers[1].mlp
    assert isinstance(blk, StackedMoEBlock)
    assert blk.router_protocol and blk.shared is not None
    assert blk.w1s[...].shape[0] == m.cfg.n_routed_experts
    got = np.asarray(m(ids), np.float32)
    np.testing.assert_allclose(ref, got, atol=2e-4 if not quantize
                               else 2e-3)


@pytest.mark.slow
def test_mla_projections_shard_column_parallel():
    """q_b/kv_b (head-major N) must carry P(None, 'model') specs — not
    silent replication — and the TP forward must match single-device."""
    from jax.sharding import PartitionSpec as P

    from neural_compressor_tpu.models import make_mesh, shard_model
    from neural_compressor_tpu.models.sharding import state_shardings

    m = DeepseekForCausalLM.from_preset("deepseek-test", dtype=jnp.float32)
    qm = nq.quantize(m, nq.RTNConfig(dtype="int8", group_size=16))
    ids = jnp.asarray(np.random.default_rng(9).integers(0, 256, (2, 10)))
    ref = np.asarray(qm(ids), np.float32)
    mesh = make_mesh((2, 4))
    for path, ns in state_shardings(qm, mesh):
        dotted = ".".join(map(str, path))
        if ("q_b_proj" in dotted or "kv_b_proj" in dotted) and \
                dotted.rsplit(".", 1)[-1] in ("kernel", "w_int8", "packed",
                                              "scales"):
            assert ns.spec == P(None, "model"), dotted
    shard_model(qm, mesh)
    got = np.asarray(qm(ids), np.float32)
    np.testing.assert_allclose(ref, got, atol=1e-4)


def test_unknown_rope_scaling_rejected(tmp_path):
    import json

    d = tmp_path / "badrope"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {"model_type": "deepseek_v3",
         "architectures": ["DeepseekV3ForCausalLM"],
         "rope_scaling": {"type": "dynamic", "factor": 2}}))
    with pytest.raises(ValueError, match="rope_scaling"):
        load_hf_model(str(d))


def test_paged_latent_cache_matches_contiguous():
    """Paged MLA decode (latent page pool + block tables) reproduces the
    contiguous latent-cache decode, with scattered page assignment."""
    from neural_compressor_tpu.models import enable_mla_latent_cache
    from neural_compressor_tpu.models.deepseek import (
        LatentKVCache, PagedLatentKVCache, init_paged_latent_pool)

    PAGE = 8
    B, P_len, T = 2, 12, 16
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 256, (B, P_len)))
    pos = jnp.full((B, 1), P_len)
    m = DeepseekForCausalLM.from_preset("deepseek-test", dtype=jnp.float32)
    enable_mla_latent_cache(m)

    lcaches = m.init_caches(B, T)
    _, lcaches = m(ids, caches=lcaches, cache_pos=0)
    ref, _ = m(ids[:, :1], positions=pos, caches=lcaches, cache_pos=P_len)
    ref = np.asarray(ref, np.float32)

    # scattered pages; page 0 is the shared trash page
    pools = init_paged_latent_pool(m.cfg, n_pages=6, batch=B, max_len=T,
                                   page_size=PAGE)
    bt = np.zeros((B, T // PAGE), np.int32)
    bt[0] = [3, 1]
    bt[1] = [5, 2]
    paged = []
    for pool, lc in zip(pools, lcaches):
        pages = pool.lat_pages
        for b in range(B):
            for p in range(T // PAGE):
                rows = lc.lat[b, :, p * PAGE:(p + 1) * PAGE]
                pages = pages.at[int(bt[b, p])].set(
                    rows.astype(pages.dtype))
        paged.append(PagedLatentKVCache(pages, jnp.asarray(bt)))

    got, new = m(ids[:, :1], positions=pos, caches=paged,
                 cache_pos=jnp.full((B,), P_len))
    got = np.asarray(got, np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
    assert isinstance(new[0], PagedLatentKVCache)
    # the new row landed: pos 12 -> page idx 1, offset 4
    pid0 = int(bt[0, P_len // PAGE])
    row = np.asarray(new[0].lat_pages[pid0, 0, P_len % PAGE], np.float32)
    assert np.abs(row).max() > 0


@pytest.mark.slow
def test_chunked_prefill_matches_dense_mla():
    """Long-prefill chunked attention on deepseek: expanded path
    (densified mask) and latent path (Hkv=1 chunked online softmax with
    the attn_scale pre-fold) == the dense-mask forward."""
    from neural_compressor_tpu.models import enable_mla_latent_cache
    from neural_compressor_tpu.models import llama as L

    ids = jnp.asarray(np.random.default_rng(9).integers(0, 256, (2, 40)))
    m = DeepseekForCausalLM.from_preset("deepseek-test", dtype=jnp.float32)
    ref = np.asarray(m(ids), np.float32)
    old = L._DENSE_MASK_ELEMS
    try:
        L.set_dense_mask_limit(64)
        got = np.asarray(m(ids), np.float32)     # expanded (densified)
    finally:
        L.set_dense_mask_limit(old)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    enable_mla_latent_cache(m)
    lc = m.init_caches(2, 64)
    ref2, _ = m(ids, caches=lc, cache_pos=0)
    ref2 = np.asarray(ref2, np.float32)
    try:
        L.set_dense_mask_limit(64)
        lc = m.init_caches(2, 64)
        got2, _ = m(ids, caches=lc, cache_pos=0)  # latent chunked
        got2 = np.asarray(got2, np.float32)
    finally:
        L.set_dense_mask_limit(old)
    np.testing.assert_allclose(got2, ref2, atol=2e-3, rtol=2e-3)
