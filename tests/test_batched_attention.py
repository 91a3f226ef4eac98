"""Batched flash-decode attention kernel (kernels/decode_attention.py
batched_decode_attention): interpret-mode parity against a dense softmax
reference, bf16 and int8-code caches, MHA and GQA, chunked T.

Reference capability anchor: the fused SDPA the reference delegates to
vLLM/HPU (torch/algorithms/fp8_quant/.../helper_modules.py:1579)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neural_compressor_tpu.kernels import decode_attention as da


def _ref_attn(q, k, v, pos, ks=None, vs=None):
    B, H, _, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    rep = H // Hkv
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    if ks is not None:
        kf = kf * np.asarray(ks, np.float32)[..., None]
        vf = vf * np.asarray(vs, np.float32)[..., None]
    kf = np.repeat(kf, rep, axis=1)
    vf = np.repeat(vf, rep, axis=1)
    s = np.einsum("bhqd,bhtd->bhqt", np.asarray(q, np.float32), kf)
    s = s / np.sqrt(D)
    pos_b = np.broadcast_to(np.asarray(pos).reshape(-1), (B,))
    mask = np.arange(T)[None, None, None, :] <= pos_b[:, None, None, None]
    s = np.where(mask, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqt,bhtd->bhqd", p, vf)


@pytest.mark.parametrize("B,H,Hkv,T,quant,posv", [
    (4, 8, 4, 256, False, 100),      # GQA bf16
    (2, 8, 8, 256, True, 17),        # MHA int8 codes
    (4, 16, 4, 512, True, None),     # GQA int8, per-slot positions
    (16, 4, 4, 1024, False, 700),    # bh_tile=8, chunked T
])
def test_batched_decode_attention_parity(B, H, Hkv, T, quant, posv):
    D = 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, 1, D)),
                    jnp.float32).astype(jnp.bfloat16)
    if quant:
        k = jnp.asarray(rng.integers(-127, 127, (B, Hkv, T, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (B, Hkv, T, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, T)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, T)), jnp.float32)
    else:
        k = jnp.asarray(rng.normal(size=(B, Hkv, T, D)),
                        jnp.float32).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, Hkv, T, D)),
                        jnp.float32).astype(jnp.bfloat16)
        ks = vs = None
    pos = (posv if posv is not None
           else jnp.asarray(rng.integers(0, T, (B,)), jnp.int32))
    out = da.batched_decode_attention(q, k, v, pos, ks, vs)
    assert out is not None and out.shape == (B, H, 1, D)
    ref = _ref_attn(q, k, v, pos, ks, vs)
    got = np.asarray(out, np.float32)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 3e-2, err


def test_batched_attention_envelope():
    # tiny BH falls back (B=1 decode keeps the fused single-row kernel)
    q = jnp.zeros((1, 8, 1, 128), jnp.bfloat16)
    k = jnp.zeros((1, 8, 256, 128), jnp.bfloat16)
    assert da.batched_decode_attention(q, k, k, 0) is None
    # prefill (S > 1) is out of scope
    q2 = jnp.zeros((4, 8, 2, 128), jnp.bfloat16)
    k2 = jnp.zeros((4, 8, 256, 128), jnp.bfloat16)
    assert da.batched_decode_attention(q2, k2, k2, 0) is None


@pytest.mark.slow
def test_batched_attention_in_model_decode():
    """B>1 quantized decode through the llama zoo dispatches the batched
    kernel (interpret on CPU) and stays consistent with its own prefill."""
    import neural_compressor_tpu as nq
    from neural_compressor_tpu.models import LlamaForCausalLM
    from neural_compressor_tpu.models.llama import init_kv_cache

    qm = nq.quantize(
        LlamaForCausalLM.from_preset("llama-test"),
        nq.RTNConfig(dtype="int4", group_size=128))
    B = 4
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 256, (B, 8)))
    full = np.asarray(qm(jnp.concatenate([ids, ids[:, :1]], 1)), np.float32)
    old_min = da._BATCHED_ATTN_MIN_BH
    da._BATCHED_ATTN_MIN_BH = 8  # llama-test has 2 kv heads; B*Hkv = 8
    try:
        caches = init_kv_cache(qm.cfg, B, 128, quantized="int8")
        logits, caches = qm(ids, caches=caches, cache_pos=0)
        step, caches = qm(ids[:, :1], positions=jnp.full((B, 1), 8),
                          caches=caches, cache_pos=8)
    finally:
        da._BATCHED_ATTN_MIN_BH = old_min
    got = np.asarray(step[:, 0], np.float32)
    ref = full[:, -1]
    rel = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert rel < 0.06, rel
