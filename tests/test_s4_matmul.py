"""Native-int4 ("s4_rowpack") serving layout: packing round-trip, matmul
fallback numerics, serving conversion, and generate() equality.

The s4 kernel itself (kernels/s4_matmul.py) only runs on real TPU hardware
(Mosaic int4 refs are wrong under interpret mode — experiments log); on CPU
every path must fall back to the XLA dequant route and stay numerically
aligned with the tpu_strided serving stack. On-chip numerics are covered by
the verify-skill probes and bench (/verify drive recipes).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels.s4_matmul import s4_matmul, s4_usable
from neural_compressor_tpu.kernels.w4a8_matmul import w4a8_matmul
from neural_compressor_tpu.ops.packing import (dequantize_packed,
                                               pack_codes_s4, pack_qtensor,
                                               s4_view, to_s4_rowpack,
                                               unpack_codes_s4,
                                               unpack_to_codes)
from neural_compressor_tpu.ops.qtensor import quantize_tensor

import jax


def _pw(K=512, N=768, G=128, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    return w, pack_qtensor(quantize_tensor(w, bits=4, group_size=G,
                                           scheme="sym"))


class TestS4Packing:
    def test_codes_round_trip(self):
        rng = np.random.default_rng(1)
        codes = jnp.asarray(rng.integers(-8, 8, (64, 256)), jnp.int8)
        packed = pack_codes_s4(codes)
        assert packed.dtype == jnp.uint32
        assert packed.shape == (64, 32)
        back = unpack_codes_s4(packed, 64, 256)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))

    def test_s4_view_matches_codes(self):
        rng = np.random.default_rng(2)
        codes = jnp.asarray(rng.integers(-8, 8, (32, 128)), jnp.int8)
        packed = pack_codes_s4(codes)
        v = jax.jit(lambda p: s4_view(p, 32, 128).astype(jnp.int8))(packed)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(codes))

    def test_to_s4_rowpack_preserves_dequant(self):
        w, pw = _pw()
        s4 = to_s4_rowpack(pw)
        assert s4.layout == "s4_rowpack"
        np.testing.assert_array_equal(
            np.asarray(unpack_to_codes(pw)), np.asarray(unpack_to_codes(s4)))
        np.testing.assert_allclose(
            np.asarray(dequantize_packed(pw, jnp.float32)),
            np.asarray(dequantize_packed(s4, jnp.float32)), rtol=1e-6)

    def test_rejects_asym(self):
        w = jnp.asarray(np.random.default_rng(3).standard_normal((128, 64)),
                        jnp.float32)
        pw = pack_qtensor(quantize_tensor(w, bits=4, group_size=32,
                                          scheme="asym"))
        with pytest.raises(ValueError):
            to_s4_rowpack(pw)


class TestS4Matmul:
    def test_cpu_fallback_matches_w4a8(self):
        w, pw = _pw()
        s4 = to_s4_rowpack(pw)
        x = jnp.asarray(np.random.default_rng(4).standard_normal((3, 512)),
                        jnp.bfloat16)
        y_ref = w4a8_matmul(x, pw).astype(jnp.float32)
        y_s4 = s4_matmul(x, s4).astype(jnp.float32)
        # CPU: s4 falls back to the bf16 dequant dot; tolerance covers the
        # int8-act quantization difference of the w4a8 reference
        rel = float(jnp.linalg.norm(y_s4 - y_ref) / jnp.linalg.norm(y_ref))
        assert rel < 0.02, rel

    def test_not_usable_unprepared_or_off_tpu(self):
        _, pw = _pw()
        s4 = to_s4_rowpack(pw)
        # uint32 storage (unprepared) must never claim kernel usability —
        # the per-call view re-materializes at ~20 GB/s inside loops
        assert not s4_usable(s4)

    def test_perm_rows_supported(self):
        w, pw = _pw()
        rng = np.random.default_rng(5)
        perm = jnp.asarray(rng.permutation(512), jnp.int32)
        pwp = pw._replace(perm=perm)
        s4p = to_s4_rowpack(pwp)
        assert s4p.perm is not None
        x = jnp.asarray(rng.standard_normal((2, 512)), jnp.bfloat16)
        y0 = s4_matmul(x, to_s4_rowpack(pw._replace(perm=None)))
        # stored rows are identical; perm permutes x before contraction
        y1 = s4_matmul(jnp.take(x, jnp.argsort(perm), axis=1), s4p)
        np.testing.assert_allclose(np.asarray(y0).astype(np.float32),
                                   np.asarray(y1).astype(np.float32),
                                   rtol=2e-2, atol=1e-2)


class TestS4Serving:
    def test_fuse_flag_and_generate_equality(self):
        from neural_compressor_tpu.generation.generate import greedy_search
        from neural_compressor_tpu.models import LlamaForCausalLM
        from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                             s4_prepare,
                                                             to_w4a8_serving)

        ids = jnp.asarray(np.random.default_rng(6).integers(0, 200, (2, 8)),
                          jnp.int32)

        m1 = LlamaForCausalLM.from_preset("llama-test")
        q1 = nq.quantize(m1, nq.RTNConfig(dtype="int4", group_size=32))
        fuse_for_serving(q1)
        to_w4a8_serving(q1, s4=False)
        out_strided = np.asarray(greedy_search(q1, ids, max_new_tokens=8))

        m2 = LlamaForCausalLM.from_preset("llama-test")
        q2 = nq.quantize(m2, nq.RTNConfig(dtype="int4", group_size=32))
        fuse_for_serving(q2)
        n = to_w4a8_serving(q2, s4=True)
        assert n > 0
        from neural_compressor_tpu.layers.module_utils import named_modules
        layouts = {mod.layout for _p, mod in named_modules(q2)
                   if type(mod).__name__ == "W4A8Linear"}
        assert "s4_rowpack" in layouts
        out_s4 = np.asarray(greedy_search(q2, ids, max_new_tokens=8))
        np.testing.assert_array_equal(out_strided, out_s4)

    def test_existing_w4a8_upgraded_in_place(self):
        # hybrid_gptq creates W4A8Linear directly; to_w4a8_serving must
        # upgrade its storage layout rather than skip it
        from flax import nnx

        from neural_compressor_tpu.layers.woq_linear import W4A8Linear
        from neural_compressor_tpu.quantization.fuse import to_w4a8_serving

        w, pw = _pw()
        class Holder(nnx.Module):
            def __init__(self):
                self.lin = W4A8Linear(pw)
        h = Holder()
        x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 512)),
                        jnp.bfloat16)
        y0 = np.asarray(h.lin(x)).astype(np.float32)
        n = to_w4a8_serving(h, s4=True)
        assert n == 1 and h.lin.layout == "s4_rowpack"
        y1 = np.asarray(h.lin(x)).astype(np.float32)
        rel = np.linalg.norm(y1 - y0) / np.linalg.norm(y0)
        assert rel < 0.02, rel

    def test_engine_and_speculative_with_s4(self):
        # covers the s4_prepare insertion points in serving/engine.py and
        # generation/speculative.py
        from neural_compressor_tpu.generation.generate import greedy_search
        from neural_compressor_tpu.generation.speculative import \
            speculative_greedy_search
        from neural_compressor_tpu.models import LlamaForCausalLM
        from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                             to_w4a8_serving)
        from neural_compressor_tpu.serving.engine import \
            ContinuousBatchingEngine

        rng = np.random.default_rng(8)
        m = LlamaForCausalLM.from_preset("llama-test")
        qm = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
        fuse_for_serving(qm)
        to_w4a8_serving(qm, s4=True)

        prompt = rng.integers(0, 200, (6,))
        ref = np.asarray(greedy_search(qm, jnp.asarray(prompt)[None, :],
                                       max_new_tokens=5))
        eng = ContinuousBatchingEngine(qm, n_slots=2, max_len=64)
        r = eng.submit(prompt, max_new_tokens=5)
        eng.run()
        assert r.generated == ref[0, len(prompt):].tolist()

        spec = np.asarray(speculative_greedy_search(
            qm, qm, jnp.asarray(prompt)[None, :], max_new_tokens=5, k=2))
        np.testing.assert_array_equal(spec[:, :ref.shape[1]], ref)

    def test_s4_prepare_swaps_dtype_inside_jit(self):
        from flax import nnx

        from neural_compressor_tpu.layers.woq_linear import W4A8Linear
        from neural_compressor_tpu.quantization.fuse import s4_prepare

        _, pw = _pw()
        mod = W4A8Linear(to_s4_rowpack(pw))
        graphdef, state = nnx.split(mod)

        @jax.jit
        def probe(state):
            m = nnx.merge(graphdef, state)
            n = s4_prepare(m)
            return m.packed[...].astype(jnp.int8), n

        codes, n = probe(state)
        assert n == 1
        np.testing.assert_array_equal(np.asarray(codes),
                                      np.asarray(unpack_to_codes(pw)))
