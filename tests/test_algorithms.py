"""Per-algorithm end-to-end tests on tiny models (reference test style:
tiny model → quantize → module replacement + output closeness)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import calibration_forward
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.qlinear import (
    DynamicQuantLinear,
    FP8Linear,
    HalfPrecisionLinear,
    StaticQuantLinear,
)
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.models.llama import init_kv_cache


@pytest.fixture
def llama():
    return LlamaForCausalLM.from_preset("llama-test")


@pytest.fixture
def ids():
    return jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))


@pytest.fixture
def calib():
    rng = np.random.default_rng(1)
    return [jnp.asarray(rng.integers(0, 256, (4, 32))) for _ in range(3)]


def _rel(y0, y1):
    y0 = y0.astype(jnp.float32)
    y1 = y1.astype(jnp.float32)
    return float(jnp.linalg.norm(y0 - y1) / jnp.linalg.norm(y0))


class TestAWQ:
    def test_e2e_beats_sanity(self, llama, ids, calib):
        y0 = llama(ids)
        qm = nq.quantize(llama, nq.AWQConfig(dtype="int4", group_size=32),
                         run_fn=lambda m: calibration_forward(m, calib))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"), WOQLinear)
        assert _rel(y0, qm(ids)) < 0.5

    def test_no_scale_no_clip(self, llama, ids, calib):
        qm = nq.quantize(
            llama,
            nq.AWQConfig(dtype="int4", group_size=32, use_auto_scale=False,
                         use_auto_clip=False),
            run_fn=lambda m: calibration_forward(m, calib))
        assert isinstance(
            get_module(qm, "model.layers.1.mlp.down_proj"), WOQLinear)


class TestTEQ:
    def test_e2e(self, llama, ids, calib):
        y0 = llama(ids)
        qm = nq.quantize(
            llama, nq.TEQConfig(dtype="int4", group_size=32, train_steps=10),
            run_fn=lambda m: calibration_forward(m, calib))
        assert isinstance(
            get_module(qm, "model.layers.0.mlp.gate_proj"), WOQLinear)
        assert _rel(y0, qm(ids)) < 0.5


class TestAutoRound:
    def test_e2e_improves_on_rtn_weights(self, llama, ids, calib):
        y0 = llama(ids)
        qm = nq.quantize(
            llama, nq.AutoRoundConfig(dtype="int4", group_size=32, iters=20),
            run_fn=lambda m: calibration_forward(m, calib))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.o_proj"), WOQLinear)
        assert _rel(y0, qm(ids)) < 0.5


class TestHQQ:
    def test_e2e(self, llama, ids):
        y0 = llama(ids)
        qm = nq.quantize(llama, nq.HQQConfig(dtype="int4", group_size=32))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"), WOQLinear)
        assert _rel(y0, qm(ids)) < 0.4

    def test_hqq_beats_rtn_asym_on_weights(self):
        from neural_compressor_tpu.algorithms.hqq import hqq_optimize
        from neural_compressor_tpu.ops.qtensor import qdq_tensor, QTensor
        from neural_compressor_tpu.ops.qtensor import dequantize

        rng = np.random.default_rng(0)
        # heavy-tailed weights — where HQQ's robust objective helps
        w = jnp.asarray(rng.standard_t(df=3, size=(128, 128)),
                        dtype=jnp.float32)
        codes, s, z = hqq_optimize(w, 4, 32)
        qt = QTensor(codes, s, z, "int", 4, 32, (128, 128))
        err_hqq = float(jnp.linalg.norm(w - dequantize(qt)))
        err_rtn = float(jnp.linalg.norm(
            w - qdq_tensor(w, bits=4, group_size=32, scheme="asym")))
        # HQQ optimizes an lp-robust objective; it should not be much worse
        # on L2 and typically wins on heavy tails
        assert err_hqq < err_rtn * 1.05


class TestSmoothQuant:
    def test_e2e(self, llama, ids, calib):
        y0 = llama(ids)
        qm = nq.quantize(llama, nq.SmoothQuantConfig(alpha=0.5),
                         run_fn=lambda m: calibration_forward(m, calib))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"),
            StaticQuantLinear)
        assert _rel(y0, qm(ids)) < 0.3

    def test_auto_alpha(self, llama, ids, calib):
        qm = nq.quantize(
            llama, nq.SmoothQuantConfig(auto_alpha=True),
            run_fn=lambda m: calibration_forward(m, calib))
        assert isinstance(
            get_module(qm, "model.layers.1.mlp.up_proj"), StaticQuantLinear)


class TestStaticDynamicFP8:
    def test_dynamic(self, llama, ids):
        y0 = llama(ids)
        qm = nq.quantize(llama, nq.DynamicQuantConfig())
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"),
            DynamicQuantLinear)
        assert _rel(y0, qm(ids)) < 0.2

    def test_static(self, llama, ids, calib):
        y0 = llama(ids)
        qm = nq.quantize(llama, nq.INT8StaticQuantConfig(),
                         run_fn=lambda m: [m(b) for b in calib])
        assert isinstance(
            get_module(qm, "model.layers.0.mlp.up_proj"), StaticQuantLinear)
        assert _rel(y0, qm(ids)) < 0.35

    def test_fp8(self, llama, ids, calib):
        y0 = llama(ids)
        qm = nq.quantize(llama, nq.FP8Config(fp8_config="E4M3"),
                         run_fn=lambda m: [m(b) for b in calib])
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.v_proj"), FP8Linear)
        assert _rel(y0, qm(ids)) < 0.25

    def test_fp8_prepare_convert(self, llama, calib):
        prepared = nq.prepare(llama, nq.FP8Config())
        for b in calib:
            prepared(b)
        nq.finalize_calibration(prepared)
        converted = nq.convert(prepared)
        assert isinstance(
            get_module(converted, "model.layers.0.self_attn.q_proj"),
            FP8Linear)


class TestMXQuant:
    def test_mx_qdq_accuracy(self):
        from neural_compressor_tpu.ops.mx import quantize_mx

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((64, 128)), dtype=jnp.float32)
        for fmt, tol in [("fp8_e4m3", 0.05), ("fp8_e5m2", 0.12),
                         ("int8", 0.02), ("fp4", 0.4)]:
            xq = quantize_mx(x, fmt, block_size=32, axis=-1)
            rel = float(jnp.linalg.norm(x - xq) / jnp.linalg.norm(x))
            assert rel < tol, (fmt, rel)

    def test_e2e(self, llama, ids):
        from neural_compressor_tpu.algorithms.mx import MXLinear

        y0 = llama(ids)
        qm = nq.quantize(llama, nq.MXQuantConfig(w_dtype="mxfp8_e4m3",
                                                 weight_only=True))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"), MXLinear)
        assert _rel(y0, qm(ids)) < 0.15

    def test_nvfp4_beats_mxfp4(self):
        # NVFP4's e4m3 block scales carry mantissa; MX fp4's pow2 shared
        # exponent wastes up to 1 bit of range per block -> higher error.
        from neural_compressor_tpu.ops.mx import quantize_mx, quantize_nvfp4

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((64, 128)), dtype=jnp.float32)
        mx_rel = float(jnp.linalg.norm(x - quantize_mx(x, "fp4", 32, -1))
                       / jnp.linalg.norm(x))
        nv_rel = float(jnp.linalg.norm(x - quantize_nvfp4(x))
                       / jnp.linalg.norm(x))
        assert nv_rel < mx_rel, (nv_rel, mx_rel)
        assert nv_rel < 0.25, nv_rel

    def test_nvfp4_zero_safe_and_grid(self):
        from neural_compressor_tpu.ops.mx import quantize_nvfp4

        z = quantize_nvfp4(jnp.zeros((4, 32)))
        assert not np.any(np.isnan(np.asarray(z))) and np.all(
            np.asarray(z) == 0)
        # odd (non-multiple-of-16) trailing dim pads and unpads
        x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 21)),
                        dtype=jnp.float32)
        assert quantize_nvfp4(x).shape == x.shape

    def test_nvfp4_e2e(self, llama, ids):
        from neural_compressor_tpu.algorithms.mx import MXLinear

        y0 = llama(ids)
        qm = nq.quantize(llama, nq.MXQuantConfig(
            w_dtype="nvfp4", blocksize=16, weight_only=True))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"), MXLinear)
        # wiring test; 4-bit on random-init weights is inherently coarse
        assert _rel(y0, qm(ids)) < 0.4


class TestMixedPrecision:
    def test_bf16(self, llama, ids):
        qm = nq.quantize(llama, nq.MixedPrecisionConfig(dtype="bf16"))
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"),
            HalfPrecisionLinear)


class TestKVCacheQuant:
    def test_quantized_cache_decode(self, llama, ids):
        qm = nq.quantize(llama, nq.KVCacheQuantConfig(dtype="int8"))
        assert getattr(qm, "kv_cache_quantized", False)
        caches = init_kv_cache(qm.cfg, 2, 32, quantized=True)
        lg, caches = qm(ids, caches=caches, cache_pos=0)
        full = qm(ids)
        # int8 KV introduces small error only
        assert _rel(full[:, -1], lg[:, -1]) < 0.05


class TestComposable:
    def test_woq_plus_kv_cache(self, llama, ids):
        cfg = nq.RTNConfig(dtype="int4", group_size=32) + nq.KVCacheQuantConfig()
        qm = nq.quantize(llama, cfg)
        assert isinstance(
            get_module(qm, "model.layers.0.self_attn.q_proj"), WOQLinear)
        assert getattr(qm, "kv_cache_quantized", False)


class TestAbsorbFold:
    """Scale-fold correctness across absorb groups (awq.apply_absorb_fold)."""

    def test_partial_group_keeps_fp_child_exact(self, llama, ids, calib):
        # k_proj stays fp while q/v quantize: the shared input_layernorm is
        # folded by 1/s, so the fp child must be compensated by s — the
        # elementwise product ln_w[k] * kernel[k, :] is the invariant.
        from neural_compressor_tpu.algorithms.calib_capture import (
            calibration_forward)
        blk = llama.model.layers[0]
        ln_w0 = blk.input_layernorm.weight[...].astype(jnp.float32)
        p0 = ln_w0[:, None] * blk.self_attn.k_proj.kernel[...].astype(
            jnp.float32)
        cfg = nq.AWQConfig(dtype="int4", group_size=32, use_auto_clip=False)
        cfg.set_local(r".*k_proj", nq.AWQConfig(dtype="fp32"))
        qm = nq.quantize(llama, cfg,
                         run_fn=lambda m: calibration_forward(m, calib))
        blk = qm.model.layers[0]
        assert isinstance(get_module(blk, "self_attn.q_proj"), WOQLinear)
        assert not isinstance(get_module(blk, "self_attn.k_proj"), WOQLinear)
        ln_w1 = blk.input_layernorm.weight[...].astype(jnp.float32)
        # the fold fired (s != 1 on random calibration is guaranteed)
        assert not np.allclose(np.asarray(ln_w0), np.asarray(ln_w1))
        p1 = ln_w1[:, None] * blk.self_attn.k_proj.kernel[...].astype(
            jnp.float32)
        # bf16 param storage rounds each factor; the product must survive
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=2e-2, atol=1e-5)

    def test_smoothquant_layernorm_model_smooths(self):
        # nnx.LayerNorm exposes `scale`, not `weight`: the fold must fire
        # (it used to silently no-op, leaving plain W8A8 with no migration)
        from neural_compressor_tpu.algorithms.calib_capture import (
            calibration_forward)
        from neural_compressor_tpu.models.gpt2 import (GPT2Config,
                                                       GPT2LMHeadModel)
        g = GPT2LMHeadModel(
            GPT2Config(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                       n_positions=64), nnx.Rngs(0))
        rng = np.random.default_rng(7)
        calib = [jnp.asarray(rng.integers(0, 128, (2, 16)))
                 for _ in range(2)]
        ids = jnp.asarray(rng.integers(0, 128, (2, 8)))
        y0 = g(ids).astype(jnp.float32)
        scale0 = np.asarray(g.h[0].ln_1.scale[...])
        qg = nq.quantize(g, nq.SmoothQuantConfig(alpha=0.5),
                         run_fn=lambda m: calibration_forward(m, calib))
        assert isinstance(get_module(qg, "h.0.attn.c_attn"),
                          StaticQuantLinear)
        scale1 = np.asarray(qg.h[0].ln_1.scale[...])
        assert not np.allclose(scale0, scale1), "LayerNorm fold never fired"
        assert _rel(y0, qg(ids)) < 0.3

    def test_awq_unreplayed_target_stays_fp(self, llama, calib):
        # a target that never sees a calibration batch must be skipped, not
        # crash on an empty sample concatenation
        from neural_compressor_tpu.algorithms.calib_capture import (
            calibration_forward)
        from neural_compressor_tpu.algorithms.awq import ActStatObserver
        obs = ActStatObserver(lambda x: x, 8)
        assert obs.sample() is None
