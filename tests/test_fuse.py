"""Projection fusion must be bit-exact (group scales are per out-channel,
so concat along N changes nothing numerically)."""

import jax.numpy as jnp
import numpy as np
import pytest

import neural_compressor_tpu as nq
from neural_compressor_tpu.generation import greedy_search
from neural_compressor_tpu.models import LlamaForCausalLM


def test_fuse_exact_and_generate_identical():
    rng = np.random.default_rng(0)
    m = LlamaForCausalLM.from_preset("llama-test")
    ids = jnp.asarray(rng.integers(0, 256, (2, 16)))
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    y0 = np.asarray(qm(ids), dtype=np.float32)
    g0 = np.asarray(greedy_search(qm, ids[:, :8], max_new_tokens=4))
    n = nq.fuse_for_serving(qm)
    assert n == 4  # 2 layers x (qkv + gate_up)
    y1 = np.asarray(qm(ids), dtype=np.float32)
    np.testing.assert_array_equal(y0, y1)
    g1 = np.asarray(greedy_search(qm, ids[:, :8], max_new_tokens=4))
    np.testing.assert_array_equal(g0, g1)


def test_fuse_skips_mismatched():
    m = LlamaForCausalLM.from_preset("llama-test")
    cfg = nq.RTNConfig(dtype="int4", group_size=32)
    cfg.set_local("model.layers.0.self_attn.k_proj",
                  nq.RTNConfig(dtype="int8", group_size=32))
    qm = nq.quantize(m, cfg)
    n = nq.fuse_for_serving(qm)
    # layer 0 qkv not fusible (mixed bits); layer 1 qkv + both gate_ups fuse
    assert n == 3


def test_fused_model_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 256, (2, 12)))
    m = LlamaForCausalLM.from_preset("llama-test")
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    nq.fuse_for_serving(qm)
    y0 = np.asarray(qm(ids), dtype=np.float32)
    nq.save(qm, str(tmp_path / "fused"))
    loaded = nq.load(str(tmp_path / "fused"),
                     LlamaForCausalLM.from_preset("llama-test"))
    # skeleton's split projections must be gone; fused module in place
    att = loaded.model.layers[0].self_attn
    assert att.q_proj is None and att.qkv_proj is not None
    np.testing.assert_array_equal(
        np.asarray(loaded(ids), dtype=np.float32), y0)


def test_to_w4a8_serving_skips_ineligible():
    """Asym / codebook weights must NOT convert: W4A8Linear would drop to
    the XLA fallback (slower than WOQLinear's fused kernels), and the TP
    w4a8 kernels are symmetric-only. Outputs must be bit-identical."""
    from neural_compressor_tpu.layers.woq_linear import W4A8Linear, WOQLinear
    from neural_compressor_tpu.layers.module_utils import named_modules
    from neural_compressor_tpu.quantization.fuse import to_w4a8_serving

    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 256, (1, 12)))
    qm = nq.quantize(LlamaForCausalLM.from_preset("llama-test"),
                     nq.RTNConfig(dtype="int4", group_size=32,
                                  use_sym=False))
    y0 = np.asarray(qm(ids), dtype=np.float32)
    n = to_w4a8_serving(qm)
    assert n == 0  # nothing eligible
    kinds = {type(mod) for _p, mod in named_modules(qm)
             if isinstance(mod, WOQLinear)}
    assert W4A8Linear not in kinds
    np.testing.assert_array_equal(
        np.asarray(qm(ids), dtype=np.float32), y0)


def test_fuse_after_w4a8_conversion():
    """fuse_for_serving must fuse W4A8Linear groups too (conversion order
    must not silently forfeit the qkv/gate_up fusion win). Fusion can move
    small-N projections onto the int8-MXU kernel (N-concat crosses the
    tile threshold), so outputs are close, not bit-equal."""
    from neural_compressor_tpu.layers.woq_linear import W4A8Linear
    from neural_compressor_tpu.layers.module_utils import get_module
    from neural_compressor_tpu.quantization.fuse import to_w4a8_serving

    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, 256, (2, 12)))
    qm = nq.quantize(LlamaForCausalLM.from_preset("llama-test"),
                     nq.RTNConfig(dtype="int4", group_size=32))
    to_w4a8_serving(qm, s4=False)
    y0 = np.asarray(qm(ids), dtype=np.float32)
    n = nq.fuse_for_serving(qm)
    assert n == 4  # 2 layers x (qkv + gate_up)
    qkv = get_module(qm, "model.layers.0.self_attn.qkv_proj")
    assert type(qkv) is W4A8Linear
    y1 = np.asarray(qm(ids), dtype=np.float32)
    rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
    assert rel < 0.1, rel


def test_to_w4a8_serving_swap_and_closeness():
    from neural_compressor_tpu.layers.woq_linear import W4A8Linear, WOQLinear
    from neural_compressor_tpu.layers.module_utils import named_modules
    from neural_compressor_tpu.quantization.fuse import to_w4a8_serving

    rng = np.random.default_rng(3)
    m = LlamaForCausalLM.from_preset("llama-test")
    ids = jnp.asarray(rng.integers(0, 256, (1, 16)))
    qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
    nq.fuse_for_serving(qm)
    y0 = np.asarray(qm(ids), dtype=np.float32)
    n = to_w4a8_serving(qm)
    assert n > 0
    kinds = {type(mod) for _p, mod in named_modules(qm)
             if isinstance(mod, WOQLinear)}
    assert kinds == {W4A8Linear}  # every quantized module swapped
    # int8 dynamic act quant perturbs outputs slightly, never wildly
    y1 = np.asarray(qm(ids), dtype=np.float32)
    rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
    assert rel < 0.1, rel
    # token-level agreement on a short greedy rollout
    g0 = np.asarray(greedy_search(qm, ids[:, :8], max_new_tokens=4))
    assert g0.shape[-1] == 12


def test_u4k_scales_in_weights_roundtrip():
    """"u4_kpack_sc" (scales appended to the packed buffer — the fused
    matvec's single-operand form, an A/B lever measured SLOWER and kept
    default-off): append/strip round-trips exactly, non-fused consumers
    strip transparently, and non-8-multiple group counts pad."""
    import jax.numpy as jnp
    import numpy as np

    from neural_compressor_tpu.layers.woq_linear import W4A8Linear
    from neural_compressor_tpu.ops.packing import (pack_qtensor,
                                                   to_u4_kpack,
                                                   u4k_append_scales,
                                                   u4k_strip_scales)
    from neural_compressor_tpu.ops.qtensor import quantize_tensor

    rng = np.random.default_rng(0)
    # 8 groups (aligned) / 11 groups (needs padding to 16 rows)
    for K, G in ((256, 32), (1408, 128)):
        w = jnp.asarray(rng.standard_normal((K, 256)) * 0.05, jnp.float32)
        pw = to_u4_kpack(pack_qtensor(quantize_tensor(w, bits=4,
                                                      group_size=G)))
        pws = u4k_append_scales(pw)
        assert pws.layout == "u4_kpack_sc"
        assert pws.packed.shape[0] >= K // 8 + K // G
        assert (pws.packed.shape[0] - K // 8) % 8 == 0  # padded rows
        st = u4k_strip_scales(pws)
        assert st.layout == "u4_kpack"
        np.testing.assert_array_equal(np.asarray(st.packed),
                                      np.asarray(pw.packed))
        # module dispatch strips transparently (XLA fallback on CPU)
        mod = W4A8Linear(pw)
        ref = np.asarray(mod(jnp.ones((2, K), jnp.float32)), np.float32)
        mod_sc = W4A8Linear(pws)
        y = np.asarray(mod_sc(jnp.ones((2, K), jnp.float32)), np.float32)
        np.testing.assert_allclose(y, ref, rtol=0, atol=1e-5)
