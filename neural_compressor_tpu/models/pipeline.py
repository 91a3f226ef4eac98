"""Pipeline parallelism (GPipe-style) over a mesh axis.

TPU-native design: the decoder layers are STACKED along a leading stage
axis and sharded over the mesh's ``stage`` axis; one ``shard_map`` program
runs the classic GPipe schedule — every tick each stage applies its local
layer block and ``ppermute``s the activation to the next stage, with
microbatches injected at stage 0 and collected at the last stage. The
schedule is a ``lax.fori_loop`` (static shapes, compiler-friendly) and the
whole thing is differentiable (JAX ADs through ppermute), so the same
machinery serves forward inference and pipeline-parallel training.

Reference counterpart: the reference delegates multi-device placement to
deepspeed (`device_map`/PP in its torch serving stacks); this is the
jax.sharding-native equivalent (scaling-book pipelining recipe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _as_stacked(layer_params: list):
    """Stack a list of identical-pytree layer params along a new leading
    axis: L x tree -> tree with leaves [L, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layer_params)


def pipeline_apply(apply_layer, stacked_params, x, *, mesh: Mesh,
                   axis: str = "model", microbatches: int | None = None):
    """Run ``x`` through L stacked layers pipelined over ``axis``.

    apply_layer(params_leaf_tree, x) -> x for ONE layer (same signature
    as a scan body). ``stacked_params``: pytree with leading dim L
    (L % n_stages == 0); layers are distributed contiguously over the
    stages. ``x``: [B, ...] with B % microbatches == 0.

    Returns the same result as sequentially applying the L layers (up to
    reduction reorder), computed with the GPipe schedule: M + S - 1 ticks,
    each stage busy M of them.
    """
    S = mesh.shape[axis]
    B = x.shape[0]
    M = microbatches or S
    assert B % M == 0, f"batch {B} must split into {M} microbatches"
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % S == 0, f"L={L} layers must split over {S} stages"
    mb = B // M
    x_mb = x.reshape(M, mb, *x.shape[1:])

    # stage s holds layers [s*L/S, (s+1)*L/S): shard the stacked leading
    # dim over the stage axis
    spec_params = jax.tree.map(
        lambda a: P(axis, *(None,) * (a.ndim - 1)), stacked_params)
    stacked_params = jax.tree.map(
        lambda a, s: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, s)),
        stacked_params, spec_params)

    from jax import shard_map

    def stage_program(params_local, x_all):
        # params_local: [L/S, ...] this stage's layer block
        # x_all: [M, mb, ...] (replicated input microbatches)
        idx = jax.lax.axis_index(axis)
        S_ = jax.lax.axis_size(axis)
        perm = [(i, (i + 1) % S_) for i in range(S_)]

        def apply_block(x):
            def body(x, p):
                # pin the carry type: layers may emit a different
                # dtype/weak-type than their input
                return apply_layer(p, x).astype(x.dtype), None

            y, _ = jax.lax.scan(body, x, params_local)
            return y

        def tick(t, carry):
            buf, outs = carry
            # stage 0 injects microbatch t (clamped; masked when t >= M)
            t0 = jnp.clip(t, 0, M - 1)
            inj = jax.lax.dynamic_index_in_dim(x_all, t0, axis=0,
                                               keepdims=False)
            inp = jnp.where(idx == 0, inj, buf)
            out = apply_block(inp)
            # last stage finished microbatch t - (S-1) at this tick
            done_t = jnp.clip(t - (S_ - 1), 0, M - 1)
            record = jnp.logical_and(idx == S_ - 1, t >= S_ - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, done_t, axis=0,
                                               keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(record, out, cur), done_t, axis=0)
            buf = jax.lax.ppermute(out, axis, perm)
            return buf, outs

        buf0 = jnp.zeros_like(x_all[0])
        outs0 = jnp.zeros_like(x_all)
        _buf, outs = jax.lax.fori_loop(0, M + S_ - 1, tick, (buf0, outs0))
        # outs is valid only on the last stage: broadcast it to all
        # stages (psum of the masked value) so the output is replicated
        outs = jax.lax.psum(
            jnp.where(idx == S_ - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    in_specs = (jax.tree.map(
        lambda a: P(axis, *(None,) * (a.ndim - 1)), stacked_params),
        P(*(None,) * x_mb.ndim))
    out = shard_map(stage_program, mesh=mesh, in_specs=in_specs,
                    out_specs=P(*(None,) * x_mb.ndim),
                    check_vma=False)(stacked_params, x_mb)
    return out.reshape(B, *x.shape[1:])
