"""Save/load round-trips (reference test style: test_load.py, FP8
test_save_load.py) and the accuracy-driven autotune loop."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.common.tuning import TuningConfig
from neural_compressor_tpu.layers import WOQLinear
from neural_compressor_tpu.layers.module_utils import get_module
from neural_compressor_tpu.models import LlamaForCausalLM


@pytest.fixture
def ids():
    return jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))


def _rel(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))


class TestSaveLoad:
    @pytest.mark.parametrize("cfg", [
        nq.RTNConfig(dtype="int4", group_size=32),
        nq.RTNConfig(dtype="int8", group_size=32, use_sym=False),
        nq.RTNConfig(dtype="nf4", group_size=32),
        nq.DynamicQuantConfig(),
        nq.MixedPrecisionConfig(dtype="bf16"),
    ], ids=["int4", "int8_asym", "nf4", "dynamic", "bf16"])
    def test_default_roundtrip(self, tmp_path, ids, cfg):
        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(m, cfg)
        y0 = qm(ids)
        nq.save(qm, str(tmp_path / "ckpt"))
        skeleton = LlamaForCausalLM.from_preset("llama-test")
        loaded = nq.load(str(tmp_path / "ckpt"), skeleton)
        y1 = loaded(ids)
        np.testing.assert_allclose(np.asarray(y0, dtype=np.float32),
                                   np.asarray(y1, dtype=np.float32),
                                   atol=1e-2)

    def test_fp8_roundtrip(self, tmp_path, ids):
        rng = np.random.default_rng(1)
        calib = [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)]
        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(m, nq.FP8Config(),
                         run_fn=lambda mm: [mm(b) for b in calib])
        y0 = qm(ids)
        nq.save(qm, str(tmp_path / "ckpt"))
        loaded = nq.load(str(tmp_path / "ckpt"),
                         LlamaForCausalLM.from_preset("llama-test"))
        np.testing.assert_allclose(np.asarray(y0, dtype=np.float32),
                                   np.asarray(loaded(ids), dtype=np.float32),
                                   atol=1e-2)

    def test_gptq_format_roundtrip(self, tmp_path, ids):
        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", use_sym=False,
                                         group_size=32))
        y0 = qm(ids)
        nq.save(qm, str(tmp_path / "gptq_ckpt"), format="gptq")
        loaded = nq.load(str(tmp_path / "gptq_ckpt"),
                         LlamaForCausalLM.from_preset("llama-test"))
        assert isinstance(
            get_module(loaded, "model.layers.0.self_attn.q_proj"), WOQLinear)
        # fp16 scales in the GPTQ layout → small roundtrip error
        assert _rel(y0, loaded(ids)) < 0.02


class TestAutotune:
    def test_stops_at_goal(self, ids):
        m = LlamaForCausalLM.from_preset("llama-test")
        y_ref = m(ids).astype(jnp.float32)
        calls = []

        def eval_fn(model):
            y = model(ids).astype(jnp.float32)
            score = 1.0 - _rel(y_ref, y)
            calls.append(score)
            return score

        cfg = nq.RTNConfig(dtype=["int4", "int8"], group_size=32)
        best = nq.autotune(m, TuningConfig(config_set=cfg, tolerable_loss=0.1,
                                           max_trials=4), eval_fn=eval_fn)
        assert best is not None
        # int4 trial (rel~0.25) fails the 10% goal; int8 (rel~0.01) passes
        assert len(calls) >= 2

    def test_max_trials_returns_best(self, ids):
        m = LlamaForCausalLM.from_preset("llama-test")
        y_ref = m(ids).astype(jnp.float32)

        def eval_fn(model):
            return 1.0 - _rel(y_ref, model(ids).astype(jnp.float32))

        cfg = nq.RTNConfig(dtype=["int2", "int4"], group_size=32)
        best = nq.autotune(
            m, TuningConfig(config_set=cfg, tolerable_loss=0.0001,
                            max_trials=2), eval_fn=eval_fn)
        assert best is not None
        # best (int4) should have been re-selected over int2
        q = get_module(best, "model.layers.0.self_attn.q_proj")
        assert q.bits == 4

    def test_exhausted_set_returns_best_not_last(self, ids):
        """When the config set exhausts before the stop rule fires, the
        BEST-scoring trial's config wins, not the last one evaluated
        (int4 first, int2 last; unreachable goal, generous max_trials)."""
        m = LlamaForCausalLM.from_preset("llama-test")
        y_ref = m(ids).astype(jnp.float32)

        def eval_fn(model):
            return 1.0 - _rel(y_ref, model(ids).astype(jnp.float32))

        cfg = nq.RTNConfig(dtype=["int4", "int2"], group_size=32)
        best = nq.autotune(
            m, TuningConfig(config_set=cfg, tolerable_loss=0.00001,
                            max_trials=50), eval_fn=eval_fn)
        q = get_module(best, "model.layers.0.self_attn.q_proj")
        assert q.bits == 4


class TestLayerFallback:
    def test_escalates_until_goal(self, ids):
        from neural_compressor_tpu.quantization.layer_fallback import (
            autotune_layer_fallback,
            rank_layer_sensitivity,
        )

        m = LlamaForCausalLM.from_preset("llama-test")
        y_ref = m(ids).astype(jnp.float32)

        def eval_fn(mm):
            y = mm(ids).astype(jnp.float32)
            return 1.0 - _rel(y_ref, y)

        cfg = nq.RTNConfig(dtype="int2", group_size=32)  # aggressively bad
        ranking = rank_layer_sensitivity(m, cfg)
        assert len(ranking) == 14 and ranking[0][1] >= ranking[-1][1]
        best, fallbacks = autotune_layer_fallback(
            m, cfg, eval_fn,
            fallback_config=nq.RTNConfig(dtype="int8", group_size=32),
            tolerable_loss=0.10, step=4, max_fallback_ops=14)
        assert best is not None
        # int2-everything cannot meet a 10% goal; fallbacks must engage
        assert len(fallbacks) > 0


class TestW4A8SaveLoad:
    def test_w4a8_roundtrip(self, tmp_path, ids):
        from neural_compressor_tpu.algorithms.calib_capture import (
            calibration_forward,
        )
        from neural_compressor_tpu.layers import W4A8Linear

        rng = np.random.default_rng(6)
        calib = [jnp.asarray(rng.integers(0, 256, (2, 16)))
                 for _ in range(2)]
        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(
            m, nq.HybridGPTQConfig(dtype="int4", group_size=32,
                                   block_size=64),
            run_fn=lambda mm: calibration_forward(mm, calib))
        y0 = np.asarray(qm(ids), dtype=np.float32)
        nq.save(qm, str(tmp_path / "w4a8"))
        loaded = nq.load(str(tmp_path / "w4a8"),
                         LlamaForCausalLM.from_preset("llama-test"))
        assert isinstance(
            get_module(loaded, "model.layers.0.self_attn.q_proj"),
            W4A8Linear)
        np.testing.assert_allclose(
            np.asarray(loaded(ids), dtype=np.float32), y0, atol=1e-2)
