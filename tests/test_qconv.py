"""Non-Linear op quantization: Conv / LinearGeneral / MHA (round-2 VERDICT
Missing #2). Reference analog: Conv2d static quant, JAX-frontend
Conv2D/EinsumDense/MHA (jax/quantization/layers_static.py:681-770)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.layers.qconv import (
    StaticQuantConv,
    WOQConv,
    WOQLinearGeneral,
    conv_spec_of,
    flatten_conv_kernel,
    linear_general_qmatrix,
)
from neural_compressor_tpu.models.vit import ViTForImageClassification
from neural_compressor_tpu.ops.packing import pack_qtensor
from neural_compressor_tpu.ops.qtensor import quantize_tensor


def _conv(cin=8, cout=16, k=(3, 3), **kw):
    return nnx.Conv(cin, cout, kernel_size=k, rngs=nnx.Rngs(0), **kw)


def _x(b=2, h=12, w=12, c=8, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, h, w, c)),
        jnp.float32)


class TestWOQConv:
    @pytest.mark.parametrize("kw", [
        dict(),
        dict(strides=(2, 2), padding="VALID"),
        dict(padding=1),
        dict(kernel_dilation=(2, 2)),
        dict(feature_group_count=4),
    ])
    def test_matches_fp_conv(self, kw):
        conv = _conv(**kw)
        x = _x()
        ref = np.asarray(conv(x), np.float32)
        qt = quantize_tensor(flatten_conv_kernel(conv.kernel[...]),
                             bits=8, group_size=32)
        q = WOQConv(pack_qtensor(qt), conv_spec_of(conv),
                    bias=conv.bias[...])
        y = np.asarray(q(x), np.float32)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel
        assert y.shape == ref.shape

    def test_mask_rejected(self):
        conv = _conv(mask=jnp.ones((3, 3, 8, 16), jnp.float32))
        with pytest.raises(NotImplementedError):
            conv_spec_of(conv)


class TestLinearGeneral:
    def test_single_axis(self):
        lg = nnx.LinearGeneral(32, (4, 8), axis=-1, rngs=nnx.Rngs(0))
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 5, 32)),
            jnp.float32)
        ref = np.asarray(lg(x), np.float32)
        k2, bias, out_shape, n_in = linear_general_qmatrix(lg)
        q = WOQLinearGeneral(pack_qtensor(quantize_tensor(
            k2, bits=8, group_size=32)), out_shape, n_in, bias=bias)
        y = np.asarray(q(x), np.float32)
        assert y.shape == ref.shape
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel

    def test_multi_contract_axes(self):
        # the MHA out-projection shape: contract over (heads, head_dim)
        lg = nnx.LinearGeneral((4, 8), 32, axis=(-2, -1), rngs=nnx.Rngs(0))
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 5, 4, 8)),
            jnp.float32)
        ref = np.asarray(lg(x), np.float32)
        k2, bias, out_shape, n_in = linear_general_qmatrix(lg)
        q = WOQLinearGeneral(pack_qtensor(quantize_tensor(
            k2, bits=8, group_size=32)), out_shape, n_in, bias=bias)
        y = np.asarray(q(x), np.float32)
        assert y.shape == ref.shape
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel


class TestStaticConv:
    def test_static_quant_conv_close(self):
        conv = _conv()
        x = _x()
        ref = np.asarray(conv(x), np.float32)
        amax = float(jnp.max(jnp.abs(x)))
        q = StaticQuantConv(flatten_conv_kernel(conv.kernel[...]),
                            jnp.float32(amax / 127.0), conv_spec_of(conv),
                            bias=conv.bias[...])
        y = np.asarray(q(x), np.float32)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel


class TestViTEndToEnd:
    def _model_and_x(self):
        m = ViTForImageClassification.from_preset("vit-test")
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
            jnp.float32)
        return m, x

    def test_rtn_quantizes_conv_mha_linear(self):
        m, x = self._model_and_x()
        ref = np.asarray(m(x), np.float32)
        qm = nq.quantize(m, nq.RTNConfig(bits=8, group_size=32))
        assert isinstance(get_module(qm, "patch_embeddings"), WOQConv)
        assert isinstance(get_module(qm, "layers.0.attention.query"),
                          WOQLinearGeneral)
        assert isinstance(get_module(qm, "layers.0.attention.out"),
                          WOQLinearGeneral)
        from neural_compressor_tpu.layers import WOQLinear
        assert type(get_module(qm, "layers.0.intermediate")) is WOQLinear
        y = np.asarray(qm(x), np.float32)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel

    def test_rtn_int4_jitted(self):
        import jax

        m, x = self._model_and_x()
        qm = nq.quantize(m, nq.RTNConfig(bits=4, group_size=32))
        gd, st = nnx.split(qm)

        @jax.jit
        def fwd(st, x):
            return nnx.merge(gd, st)(x)

        y = np.asarray(fwd(st, x), np.float32)
        assert np.isfinite(y).all()

    def test_save_load_roundtrip(self, tmp_path):
        from neural_compressor_tpu.quantization import save_load

        m, x = self._model_and_x()
        qm = nq.quantize(m, nq.RTNConfig(bits=4, group_size=32))
        ref = np.asarray(qm(x), np.float32)
        save_load.save(qm, str(tmp_path))
        fresh = ViTForImageClassification.from_preset("vit-test", seed=7)
        loaded = save_load.load(str(tmp_path), fresh)
        assert isinstance(get_module(loaded, "patch_embeddings"), WOQConv)
        assert isinstance(get_module(loaded, "layers.0.attention.query"),
                          WOQLinearGeneral)
        y = np.asarray(loaded(x), np.float32)
        # quantized modules round-trip exactly; fp modules (norms, head)
        # came from a different seed — compare only through the quantized
        # graph by checking exact equality is NOT expected; instead load
        # into the SAME-seed skeleton for bit-equality
        fresh0 = ViTForImageClassification.from_preset("vit-test")
        loaded0 = save_load.load(str(tmp_path), fresh0)
        y0 = np.asarray(loaded0(x), np.float32)
        np.testing.assert_allclose(y0, ref, rtol=0, atol=1e-6)
        assert np.isfinite(y).all()

    def test_static_int8_conv_and_linear(self):
        m, x = self._model_and_x()
        ref = np.asarray(m(x), np.float32)
        qm = nq.quantize(m, nq.INT8StaticQuantConfig(),
                         run_fn=lambda mm: mm(x))
        assert isinstance(get_module(qm, "patch_embeddings"),
                          StaticQuantConv)
        from neural_compressor_tpu.layers.qlinear import StaticQuantLinear
        assert isinstance(get_module(qm, "layers.0.intermediate"),
                          StaticQuantLinear)
        y = np.asarray(qm(x), np.float32)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.12, rel


class TestGPTQViT:
    def test_gptq_quantizes_mha_projections(self):
        """GPTQ covers LinearGeneral (MHA projections) with flattened
        multi-axis Hessians — the encoder-block analog of the reference's
        Conv2d/Conv1D SUPPORTED_LAYERS (weight_only/gptq.py:45)."""
        import neural_compressor_tpu as nq
        from neural_compressor_tpu.layers import WOQLinear

        m = ViTForImageClassification.from_preset("vit-test")
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 16, 16, 3)),
            jnp.float32)
        ref = np.asarray(m(x), np.float32)
        qm = nq.quantize(m, nq.GPTQConfig(bits=8, group_size=32),
                         run_fn=lambda mm: mm(x))
        q = get_module(qm, "layers.0.attention.query")
        o = get_module(qm, "layers.0.attention.out")
        assert isinstance(q, WOQLinearGeneral), type(q)
        assert isinstance(o, WOQLinearGeneral), type(o)
        assert type(get_module(qm, "layers.0.intermediate")) is WOQLinear
        y = np.asarray(qm(x), np.float32)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel


def test_autotune_vision_model():
    """The accuracy-driven autotune loop works on the vision family:
    top-1 agreement with the fp model as the metric, searching over the
    RTN tuning dims (Conv/LinearGeneral/Linear all re-quantize per
    trial)."""
    from neural_compressor_tpu.common.tuning import TuningConfig

    m = ViTForImageClassification.from_preset("vit-test")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, 16, 16, 3)),
        jnp.float32)
    ref_top1 = np.asarray(jnp.argmax(m(x), -1))

    def eval_fn(qm):
        return float(np.mean(np.asarray(jnp.argmax(qm(x), -1)) == ref_top1))

    cfg = nq.RTNConfig(bits=[8, 4], group_size=32)
    best = nq.autotune(m, TuningConfig(config_set=cfg, tolerable_loss=0.01),
                       eval_fn=eval_fn)
    assert best is not None
    assert isinstance(get_module(best, "patch_embeddings"), WOQConv)
    assert eval_fn(best) >= 0.9
