"""Round-4: paged MLA latent attention on the chip, deepseek-v3 shapes.

Pure attention A/B (no model build): contiguous latent einsum chain
(softmax form, as models/deepseek._latent_attend) vs the paged kernel
(kernels/paged_attention.paged_latent_attention) at H=128, C=576
(r=512 + dr=64), T=1024, B in {1, 8, 16}. Also validates the Mosaic
lowering of the kernel (tests run interpret-mode only).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from neural_compressor_tpu.kernels.paged_attention import (
    paged_latent_attention)

H, R, DR = 128, 512, 64
C = R + DR
T, PAGE = 1024, 128
STEPS = 256
SCALE = 0.1352  # v3 attn_scale ballpark; constant folds either way


@functools.partial(jax.jit, static_argnames=())
def contiguous_chain(qcat, latf, lengths, steps):
    def body(i, acc):
        s = jnp.einsum("bhc,btc->bht", qcat + acc[:, :, :1] * 1e-9, latf,
                       preferred_element_type=jnp.float32)
        s = s * SCALE
        t_idx = jnp.arange(T)[None, None, :]
        s = jnp.where(t_idx < lengths[:, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bht,btc->bhc", p.astype(latf.dtype), latf[..., :R],
                       preferred_element_type=jnp.float32)
        return acc + o
    return jax.lax.fori_loop(0, steps, body,
                             jnp.zeros((qcat.shape[0], H, R), jnp.float32))


@functools.partial(jax.jit, static_argnames=())
def paged_chain(qcat, pages, bt, lengths, steps):
    def body(i, acc):
        q4 = (qcat + acc[:, :, :1] * 1e-9)[:, :, None]  # [B,H,1,C]
        o = paged_latent_attention(q4, pages, bt, lengths, R, SCALE)
        return acc + o[:, :, 0]
    return jax.lax.fori_loop(0, steps, body,
                             jnp.zeros((qcat.shape[0], H, R), jnp.float32))


def timed(fn, *args):
    out = fn(*args, 4)
    _ = np.asarray(out).ravel()[0]
    t0 = time.time()
    out = fn(*args, STEPS)
    _ = np.asarray(out).ravel()[0]
    return (time.time() - t0) / STEPS * 1e3


def main():
    print("device:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for B in (1, 8, 16):
        pmax = T // PAGE
        n_pages = B * pmax + 1
        latf = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        qcat = jnp.asarray(rng.standard_normal((B, H, C)), jnp.bfloat16)
        lengths = jnp.full((B,), T - 1, jnp.int32)
        bt = jnp.asarray(
            1 + np.arange(B * pmax).reshape(B, pmax), jnp.int32)
        pages = jnp.zeros((n_pages, 1, PAGE, C), jnp.bfloat16)
        for b in range(B):
            for p in range(pmax):
                pages = pages.at[1 + b * pmax + p, 0].set(
                    latf[b, p * PAGE:(p + 1) * PAGE])
        # parity first
        o_ref = np.asarray(contiguous_chain(qcat, latf, lengths, 1))
        o_pag = np.asarray(paged_chain(qcat, pages, bt, lengths, 1))
        err = np.abs(o_ref - o_pag).max() / (np.abs(o_ref).max() + 1e-9)
        ms_c = timed(contiguous_chain, qcat, latf, lengths)
        ms_p = timed(paged_chain, qcat, pages, bt, lengths)
        gb = B * T * C * 2 / 1e9
        print(f"B={B:3d} contiguous {ms_c:7.3f} ms ({gb/ms_c*1e3:6.0f} GB/s)"
              f"  paged {ms_p:7.3f} ms ({gb/ms_p*1e3:6.0f} GB/s)"
              f"  rel-err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
