"""B=1 decode attention: can the fused kernel stream the cache faster?

Current _kernel_ro does one program per (b, head) reading the whole [T, D]
K and V (~0.5 MB) -- 44 us/layer measured in the 8.2 ms step profile
(= 382 GB/s of 16.8 MB/layer; XLA pure-stream ceiling is 954).
Variants:
  RO      : current read-only kernel (baseline)
  TT<n>   : T-tiled online-softmax, grid (B*Hkv, T/n) -- more grid steps
            so Mosaic double-buffers DMA against compute
  MH<m>   : m KV heads per program (bigger blocks, fewer programs)
  XLA     : einsum attention (repeat-free MHA path)
"""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from neural_compressor_tpu.kernels.decode_attention import _decode_attn_ro_impl

B, Hkv, T, D, rep = 1, 32, 1024, 128, 1

def timeit(fn, args, iters, label):
    @jax.jit
    def run(q, n):
        def body(i, q):
            o = fn(q, *args)            # [B, H, 1, D]
            return (q * 0.999 + o.reshape(q.shape) * 1e-3).astype(q.dtype)
        return jax.lax.fori_loop(0, n, body, q)
    q0 = jnp.ones((B, Hkv * rep, 1, D), jnp.bfloat16)
    _ = np.asarray(run(q0, 2).ravel()[0])
    t0 = time.time()
    _ = np.asarray(run(q0, iters).ravel()[0])
    us = (time.time() - t0) / iters * 1e6
    gbs = 2 * Hkv * T * D * 2 / us / 1e3
    print(f"  {label:8s}: {us:7.1f} us/layer ({gbs:4.0f} GB/s)", flush=True)

rng = np.random.default_rng(0)
kc = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
kn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
vn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
pos = jnp.full((B,), T - 2, jnp.int32)

def f_ro(q, kn, vn, kc, vc):
    return _decode_attn_ro_impl(pos, q[:, :, 0], kn, vn, kc, vc, False)

# --- T-tiled online softmax, grid (B*Hkv, nt) ---
def mk_tt(tile):
    nt = T // tile
    def kernel(pos_ref, q_ref, kn_ref, vn_ref, kc_in, vc_in, o_ref,
               m_ref, l_ref, acc_ref):
        h = pl.program_id(0)
        t = pl.program_id(1)
        p0 = pos_ref[0, 0]
        @pl.when(t == 0)
        def _():
            m_ref[0, 0] = jnp.float32(-1e30)
            l_ref[0, 0] = jnp.float32(0)
            acc_ref[:] = jnp.zeros_like(acc_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t * tile
        k = jnp.where(row == p0, kn_ref[:].astype(kc_in.dtype), kc_in[:])
        v = jnp.where(row == p0, vn_ref[:].astype(vc_in.dtype), vc_in[:])
        q = q_ref[:]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / D ** 0.5)
        tid = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 1) + t * tile
        s = jnp.where(tid <= p0, s, -1e30)
        m_new = jnp.maximum(m_ref[0, 0], jnp.max(s))
        corr = jnp.exp(m_ref[0, 0] - m_new)
        p = jnp.exp(s - m_new)
        l_ref[0, 0] = l_ref[0, 0] * corr + jnp.sum(p[:1])
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[0, 0] = m_new
        @pl.when(t == nt - 1)
        def _():
            o_ref[:] = (acc_ref[:] / l_ref[0, 0]).astype(o_ref.dtype)

    @jax.jit
    def f(q, kn, vn, kc, vc):
        qr = q.reshape(B * Hkv, 1, D)
        qp = jnp.pad(qr, ((0, 0), (0, 7), (0, 0)))  # 8-sublane pad
        spec = lambda shape, im: pl.BlockSpec(shape, im, memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, grid=(B * Hkv, nt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                spec((None, 8, D), lambda h, t: (h, 0, 0)),
                spec((None, None, 1, D), lambda h, t: (0, h, 0, 0)),
                spec((None, None, 1, D), lambda h, t: (0, h, 0, 0)),
                spec((None, None, tile, D), lambda h, t: (0, h, t, 0)),
                spec((None, None, tile, D), lambda h, t: (0, h, t, 0)),
            ],
            out_specs=spec((None, 8, D), lambda h, t: (h, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * Hkv, 8, D), q.dtype),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                            pltpu.SMEM((1, 1), jnp.float32),
                            pltpu.VMEM((8, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(pos.reshape(1, 1), qp, kn, vn, kc, vc)
        return out[:, :1].reshape(B, Hkv, 1, D)
    return f

# --- XLA einsum ---
@jax.jit
def f_xla(q, kn, vn, kc, vc):
    p0 = pos[0]
    kc2 = jax.lax.dynamic_update_slice(kc, kn, (0, 0, p0, 0))
    vc2 = jax.lax.dynamic_update_slice(vc, vn, (0, 0, p0, 0))
    s = jnp.einsum("bhqd,bhtd->bhqt", q.astype(jnp.float32) / D ** 0.5,
                   kc2.astype(jnp.float32))
    mask = jnp.arange(T)[None, None, None, :] <= p0
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqt,bhtd->bhqd", p, vc2.astype(jnp.float32)
                      ).astype(q.dtype)

def main():
    print("device:", jax.devices(), flush=True)
    timeit(f_ro, (kn, vn, kc, vc), 2000, "RO")
    for tile in (256, 512):
        timeit(mk_tt(tile), (kn, vn, kc, vc), 2000, f"TT{tile}")
    timeit(f_xla, (kn, vn, kc, vc), 1000, "XLA")

if __name__ == "__main__":
    main()
