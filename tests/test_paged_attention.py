"""Paged KV cache: decode over a page pool + block tables must match the
contiguous-cache decode (bf16 pool exactly; int8 pool closely)."""

import numpy as np
import pytest
import jax.numpy as jnp

from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.models.llama import (
    PagedKVCache, init_kv_cache, init_paged_pool)

PAGE = 16


def _pages_from_contiguous(pools, caches, block_tables, lengths):
    """Copy contiguous per-layer KVCache rows into the pools at the pages
    named by ``block_tables`` (test scaffolding — the engine does this
    after prefill)."""
    out = []
    for pool, cache in zip(pools, caches):
        kp, vp = pool.k_pages, pool.v_pages
        B = cache.k.shape[0]
        pmax = block_tables.shape[1]
        for b in range(B):
            n_pages = int(np.ceil(lengths[b] / PAGE))
            for p in range(n_pages):
                pid = int(block_tables[b, p])
                rows = cache.k[b, :, p * PAGE:(p + 1) * PAGE]
                kp = kp.at[pid].set(rows.astype(kp.dtype))
                rows = cache.v[b, :, p * PAGE:(p + 1) * PAGE]
                vp = vp.at[pid].set(rows.astype(vp.dtype))
        out.append(pool._replace(k_pages=kp, v_pages=vp,
                                 block_tables=jnp.asarray(block_tables)))
    return out


def test_paged_decode_matches_contiguous():
    m = LlamaForCausalLM.from_preset("llama-test")
    rng = np.random.default_rng(0)
    B, P_len = 2, 24  # crosses a page boundary (page=16)
    ids = jnp.asarray(rng.integers(0, 256, (B, P_len)))

    caches = init_kv_cache(m.cfg, B, 64)
    _, caches = m(ids, caches=caches, cache_pos=0)
    pos = jnp.full((B, 1), P_len)
    ref, _ = m(ids[:, :1], positions=pos, caches=caches, cache_pos=P_len)
    ref = np.asarray(ref, dtype=np.float32)

    # scattered, non-contiguous page assignment
    pools = init_paged_pool(m.cfg, n_pages=16, batch=B, max_len=64,
                            page_size=PAGE)
    block_tables = np.zeros((B, 4), np.int32)
    block_tables[0, :3] = [7, 2, 11]
    block_tables[1, :3] = [5, 9, 1]
    lengths = np.full((B,), P_len, np.int32)
    pools = _pages_from_contiguous(pools, caches, block_tables, lengths)

    got, new_pools = m(ids[:, :1], positions=pos, caches=pools,
                       cache_pos=jnp.full((B,), P_len))
    got = np.asarray(got, dtype=np.float32)
    # online-softmax vs single-softmax accumulation order in a bf16 model
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
    # the new row landed in the second page (pos 24 -> page 1, offset 8)
    pid0 = int(block_tables[0, 24 // PAGE])
    row = np.asarray(new_pools[0].k_pages[pid0, :, 24 % PAGE],
                     dtype=np.float32)
    assert np.abs(row).max() > 0


@pytest.mark.slow
def test_paged_decode_int8_pool_close():
    m = LlamaForCausalLM.from_preset("llama-test")
    rng = np.random.default_rng(1)
    B, P_len = 2, 20
    ids = jnp.asarray(rng.integers(0, 256, (B, P_len)))

    caches = init_kv_cache(m.cfg, B, 64)
    _, caches = m(ids, caches=caches, cache_pos=0)
    pos = jnp.full((B, 1), P_len)
    ref, _ = m(ids[:, :1], positions=pos, caches=caches, cache_pos=P_len)
    ref = np.asarray(ref, dtype=np.float32)

    pools = init_paged_pool(m.cfg, n_pages=12, batch=B, max_len=64,
                            page_size=PAGE, quantized="int8")
    block_tables = np.zeros((B, 4), np.int32)
    block_tables[0, :2] = [3, 8]
    block_tables[1, :2] = [6, 0]
    # quantize contiguous rows into the pools (per-row scales)
    from neural_compressor_tpu.models.llama import _kv_quant

    new_pools = []
    for pool, cache in zip(pools, caches):
        kp, ks, vp, vs = (pool.k_pages, pool.k_scales, pool.v_pages,
                          pool.v_scales)
        for b in range(B):
            for p in range(2):
                pid = int(block_tables[b, p])
                kr = cache.k[b:b + 1, :, p * PAGE:(p + 1) * PAGE]
                kc, ksc = _kv_quant(kr)
                kp = kp.at[pid].set(kc[0])
                ks = ks.at[pid].set(ksc[0])
                vr = cache.v[b:b + 1, :, p * PAGE:(p + 1) * PAGE]
                vc, vsc = _kv_quant(vr)
                vp = vp.at[pid].set(vc[0])
                vs = vs.at[pid].set(vsc[0])
        new_pools.append(pool._replace(
            k_pages=kp, k_scales=ks, v_pages=vp, v_scales=vs,
            block_tables=jnp.asarray(block_tables)))

    got, _ = m(ids[:, :1], positions=pos, caches=new_pools,
               cache_pos=jnp.full((B,), P_len))
    got = np.asarray(got, dtype=np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.12, err


def test_paged_v2_matches_v1():
    """The all-heads-page-block kernel (v2) is numerically identical to
    the per-(b, h, page) grid (v1), bf16 and int8 pools, mixed lengths."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_compressor_tpu.kernels import paged_attention as pa
    from neural_compressor_tpu.models.llama import init_paged_pool

    from neural_compressor_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=128,
                      max_position_embeddings=512)
    rng = np.random.default_rng(0)
    B, Hkv, page, D = 3, 2, 128, 128
    # pmax=4 divides the kernel's pages-per-step (4); pmax=6 exercises
    # the padded block-table tail (gsteps=2, last step half-masked)
    for quant, pmax in ((False, 4), (True, 4), (False, 6)):
        kp = jnp.asarray(rng.standard_normal((8, Hkv, page, D)),
                         jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((8, Hkv, page, D)),
                         jnp.bfloat16)
        ks = vs = None
        if quant:
            ksc = jnp.asarray(rng.uniform(0.01, 0.1, (8, Hkv, page)),
                              jnp.float32)
            vsc = jnp.asarray(rng.uniform(0.01, 0.1, (8, Hkv, page)),
                              jnp.float32)
            kp8 = jnp.clip(jnp.round(kp.astype(jnp.float32)
                                     / ksc[..., None]), -128, 127
                           ).astype(jnp.int8)
            vp8 = jnp.clip(jnp.round(vp.astype(jnp.float32)
                                     / vsc[..., None]), -128, 127
                           ).astype(jnp.int8)
            kp, vp, ks, vs = kp8, vp8, ksc, vsc
        bt = jnp.asarray(rng.integers(0, 8, (B, pmax)), jnp.int32)
        lengths = jnp.asarray([1, 200, 512 - 1], jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, 4, 1, D)), jnp.bfloat16)

        class Cache:
            k_pages, v_pages, k_scales, v_scales, block_tables = \
                kp, vp, ks, vs, bt

        pa.set_paged_v2(False)
        o1 = np.asarray(pa.paged_decode_attention(q, Cache, lengths),
                        np.float32)
        pa.set_paged_v2(True)
        o2 = np.asarray(pa.paged_decode_attention(q, Cache, lengths),
                        np.float32)
        np.testing.assert_allclose(o1, o2, rtol=2e-2, atol=2e-2)


def test_paged_write_kernel_matches_scatter():
    """The aliased-output write kernel == the XLA scatter fallback on
    bf16 and int8 pools, including per-slot positions and the shared
    trash page (duplicate pid)."""
    import jax.numpy as jnp
    import numpy as np

    from neural_compressor_tpu.kernels import paged_attention as pa
    from neural_compressor_tpu.models import llama as L

    rng = np.random.default_rng(1)
    P, Hkv, page, D, B = 6, 8, 128, 128, 4
    for quant in (False, True):
        if quant:
            kp = jnp.asarray(rng.integers(-100, 100, (P, Hkv, page, D)),
                             jnp.int8)
            vp = jnp.asarray(rng.integers(-100, 100, (P, Hkv, page, D)),
                             jnp.int8)
            ks = jnp.asarray(rng.uniform(0.01, 0.1, (P, Hkv, page)),
                             jnp.float32)
            vs = jnp.asarray(rng.uniform(0.01, 0.1, (P, Hkv, page)),
                             jnp.float32)
        else:
            kp = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                             jnp.bfloat16)
            vp = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                             jnp.bfloat16)
            ks = vs = None
        # slot 3 parks on the trash page 0 like slot 1 (duplicate pid)
        bt = jnp.asarray([[1, 2], [0, 0], [3, 4], [0, 0]], jnp.int32)
        cache = L.PagedKVCache(kp, ks, vp, vs, bt)
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)),
                            jnp.bfloat16)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)),
                            jnp.bfloat16)
        pos = jnp.asarray([5, 130, 200, 255], jnp.int32)

        out_k = pa.paged_write_rows(cache, k_new, v_new, pos)
        assert out_k is not None
        # scatter reference (the old path)
        pids = jnp.take_along_axis(bt, (pos // page)[:, None], 1)[:, 0]
        off = pos % page
        if quant:
            kc, ksc = L._kv_quant(k_new, fmt="int8")
            vc, vsc = L._kv_quant(v_new, fmt="int8")
            ref_k = kp.at[pids, :, off].set(kc[:, :, 0])
            ref_ks = ks.at[pids, :, off].set(ksc[:, :, 0])
            ref_v = vp.at[pids, :, off].set(vc[:, :, 0])
            ref_vs = vs.at[pids, :, off].set(vsc[:, :, 0])
            # non-trash rows must match exactly; trash page (0) rows are
            # last-write-wins in the kernel vs scatter's unspecified order
            live = np.asarray(pids) != 0
            np.testing.assert_array_equal(
                np.asarray(out_k.k_pages)[1:], np.asarray(ref_k)[1:])
            np.testing.assert_allclose(
                np.asarray(out_k.k_scales)[1:], np.asarray(ref_ks)[1:],
                rtol=1e-6)
            np.testing.assert_array_equal(
                np.asarray(out_k.v_pages)[1:], np.asarray(ref_v)[1:])
            assert live.sum() == 2
        else:
            ref_k = kp.at[pids, :, off].set(
                k_new[:, :, 0].astype(kp.dtype))
            ref_v = vp.at[pids, :, off].set(
                v_new[:, :, 0].astype(vp.dtype))
            np.testing.assert_array_equal(
                np.asarray(out_k.k_pages, np.float32)[1:],
                np.asarray(ref_k, np.float32)[1:])
            np.testing.assert_array_equal(
                np.asarray(out_k.v_pages, np.float32)[1:],
                np.asarray(ref_v, np.float32)[1:])
