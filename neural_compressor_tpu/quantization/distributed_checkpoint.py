"""Sharded (multi-host) checkpointing of quantized models.

Parity target: the reference's FP8 TP-sharded save/gather/re-shard
(fp8_quant/save_load.py:75-126, 724-919 — per-rank files, barriers, rank-0
gather with TP-aware concat, world-size re-sharding with scale-aware
requantization). TPU redesign: none of that machinery is needed — the
quantized state is a global pytree of sharded arrays, and orbax/tensorstore
writes each host's shards in parallel into ONE logical checkpoint. Loading
onto a different mesh (different "world size") just supplies different
``NamedSharding``s at restore; scales travel with their weights so no
requantization is ever required.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import nnx

from ..common import logger
from ..models.sharding import _spec_for


def save_sharded(model, path: str) -> None:
    """Write the model state (fp or quantized, sharded or not) as one
    logical orbax checkpoint; each host writes only its shards."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = nnx.state(model)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, nnx.to_pure_dict(state))
    logger.info("Saved sharded checkpoint to %s", path)


def load_sharded(path: str, model, mesh=None):
    """Restore into ``model`` (mutated in place). With ``mesh``, every leaf
    is restored directly into its TP/DP sharding per the model's partition
    rules — including onto a mesh of a different size than the one that
    wrote the checkpoint."""
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding

    path = os.path.abspath(path)
    state = nnx.state(model)
    pure = nnx.to_pure_dict(state)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        flat = state.flat_state()

        def spec_with_fallback(pth, v):
            # mirror shard_model's replicate-and-warn behavior for dims
            # that don't divide the mesh axis, instead of crashing the
            # orbax restore
            spec = _spec_for(pth, v)
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                if v.shape[dim] % mesh.shape[axis] != 0:
                    logger.warning(
                        "load_sharded: %s dim %d (%d) does not divide mesh "
                        "axis %r (%d) — restoring REPLICATED",
                        ".".join(str(p) for p in pth), dim, v.shape[dim],
                        axis, mesh.shape[axis])
                    return P()
            return spec

        sharding_by_path = {
            tuple(str(p) for p in pth):
                NamedSharding(mesh, spec_with_fallback(pth, v[...]))
            for pth, v in flat
        }
        unmatched: list = []

        def to_abstract(path_tuple, leaf):
            key = tuple(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path_tuple)
            sh = sharding_by_path.get(key)
            if sh is None:
                unmatched.append(key)
                sh = NamedSharding(mesh, P())
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)

        abstract = jax.tree_util.tree_map_with_path(to_abstract, pure)
        if unmatched:
            logger.warning(
                "load_sharded: %d leaf path(s) did not match the model's "
                "flat state (restored replicated): %s%s", len(unmatched),
                [".".join(k) for k in unmatched[:5]],
                " …" if len(unmatched) > 5 else "")
    else:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), pure)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract)
    nnx.replace_by_pure_dict(state, restored)
    nnx.update(model, state)
    logger.info("Restored sharded checkpoint from %s", path)
    return model
