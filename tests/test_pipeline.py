"""GPipe-style pipeline parallelism (models/pipeline.py): shard_map +
ppermute schedule must match the sequential layer application, forward
and through AD (pipeline-parallel training)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from neural_compressor_tpu.models.pipeline import _as_stacked, pipeline_apply


def _mesh(axis="model", n=4):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs.reshape(1, n), ("data", axis))


def _layers(L, D, seed=0):
    rng = np.random.default_rng(seed)
    return [{"w": jnp.asarray(rng.standard_normal((D, D)) * (D ** -0.5),
                              jnp.float32),
             "b": jnp.asarray(rng.standard_normal((D,)) * 0.01, jnp.float32)}
            for _ in range(L)]


def _apply(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _sequential(layers, x):
    for p in layers:
        x = _apply(p, x)
    return x


def test_pipeline_matches_sequential():
    L, D, B = 8, 32, 8
    layers = _layers(L, D)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, 5, D)),
                    jnp.float32)
    ref = np.asarray(_sequential(layers, x), np.float32)
    mesh = _mesh()
    with mesh:
        y = np.asarray(pipeline_apply(_apply, _as_stacked(layers), x,
                                      mesh=mesh), np.float32)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_pipeline_more_microbatches():
    L, D, B = 4, 16, 16
    layers = _layers(L, D, seed=2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((B, D)),
                    jnp.float32)
    ref = np.asarray(_sequential(layers, x), np.float32)
    mesh = _mesh()
    with mesh:
        y = np.asarray(pipeline_apply(_apply, _as_stacked(layers), x,
                                      mesh=mesh, microbatches=8),
                       np.float32)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_pipeline_training_grads_match():
    """AD through the ppermute schedule == sequential grads (the pp
    training path the multichip dryrun exercises)."""
    L, D, B = 4, 16, 8
    layers = _layers(L, D, seed=4)
    stacked = _as_stacked(layers)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((B, D)),
                    jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(6).standard_normal((B, D)),
                      jnp.float32)
    mesh = _mesh()

    def loss_seq(stacked):
        def body(h, p):
            return _apply(p, h), None

        y, _ = jax.lax.scan(body, x, stacked)
        return jnp.mean((y - tgt) ** 2)

    def loss_pp(stacked):
        y = pipeline_apply(_apply, stacked, x, mesh=mesh)
        return jnp.mean((y - tgt) ** 2)

    g_ref = jax.grad(loss_seq)(stacked)
    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_rejects_ragged():
    layers = _layers(6, 8)
    mesh = _mesh()
    x = jnp.zeros((4, 8), jnp.float32)
    with mesh, pytest.raises(AssertionError):
        pipeline_apply(_apply, _as_stacked(layers), x, mesh=mesh)


def test_pipeline_llama_decoder_stack():
    """PP over a REAL llama decoder stack: the stacked per-layer NNX
    states pipeline through shard_map/ppermute and match the sequential
    forward."""
    from flax import nnx

    from neural_compressor_tpu.models import LlamaForCausalLM
    from neural_compressor_tpu.models.llama import _rope

    m = LlamaForCausalLM.from_preset(
        "llama-test", num_hidden_layers=4, dtype=jnp.float32)
    cfg = m.cfg
    B, T = 4, 8
    ids = jnp.asarray(np.random.default_rng(7).integers(0, 256, (B, T)))
    ref = np.asarray(m(ids), np.float32)

    layers = list(m.model.layers)
    gd0, _st0 = nnx.split(layers[0])
    stacked = _as_stacked([nnx.split(l)[1] for l in layers])

    x = m.model.embed_tokens(ids)
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    cos, sin = _rope(positions, cfg.head_dim, cfg.rope_theta,
                     cfg.partial_rotary_factor, cfg.rope_scaling,
                     cfg.max_position_embeddings)
    # closures must be microbatch-shaped: rope rows are position-only
    # (identical across batch), keep one row and let it broadcast
    cos, sin = cos[:1], sin[:1]
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]

    def apply_layer(state, h):
        layer = nnx.merge(gd0, state)
        out, _ = layer(h, cos, sin, mask, None, None)
        return out

    mesh = _mesh()
    with mesh:
        h = pipeline_apply(apply_layer, stacked, x, mesh=mesh)
    logits = np.asarray(
        m.model.embed_tokens.attend(m.model.norm(h))
        if m.lm_head is None else m.lm_head(m.model.norm(h)), np.float32)
    np.testing.assert_allclose(logits, ref, rtol=1e-4, atol=1e-4)
