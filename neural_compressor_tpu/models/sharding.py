"""Tensor-parallel sharding rules over a (data, model) device mesh.

TPU-native replacement for the reference's pass-through TP support
(deepspeed/vLLM ``PatchedRowParallelLinear``/``PatchedColumnParallelLinear``,
fp8_quant/_quant_common/helper_modules.py:360-560): instead of patching
framework-specific parallel modules and calling NCCL collectives by hand,
we annotate every param (including the **packed** int4/int8 weights and
their scales) with a ``NamedSharding`` and let pjit/XLA insert the
all-gathers/reduce-scatters over ICI.

Column-parallel (shard N / output dim): q,k,v,gate,up,lm_head, fused c_attn
and c_fc. Row-parallel (shard K / reduction dim): o_proj, down_proj, c_proj.
Packed weights shard on the same logical dim (their row dim is K/pack_factor
which keeps divisibility because shards align to group boundaries).
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common import logger

# (regex over dotted param path) -> (spec for 2D kernels, handled below)
COLUMN_PAR = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "lm_head",
              "c_attn", "c_fc", "fc1", "w1", "w3", "query_key_value",
              "fc_in", "dense_h_to_4h", "embed_out",
              # serving-fused projections (quantization/fuse.py) — missing
              # these silently REPLICATED most of a fused model's bytes
              "qkv_proj", "gate_up_proj",
              # MLA up-projections (models/deepseek.py): their N dim is
              # head-major, so head-sharding is column-parallel; the tiny
              # a-side down-projections stay replicated on purpose
              "q_b_proj", "kv_b_proj")
ROW_PAR = ("o_proj", "down_proj", "c_proj", "fc2", "w2", "out_proj",
           "fc_out", "dense_4h_to_h", "dense")

# leaves of a WOQLinear / quantized linear that follow the kernel's sharding
_WEIGHT_LEAVES = ("kernel", "packed", "scales", "zeros", "w_int8", "w_fp8")


def llama_partition_rules():  # kept as a named export for docs/tests
    return {"column": COLUMN_PAR, "row": ROW_PAR}


def _fused_segments_divide(model, path: str, leaf: str, mod, tp: int) -> bool:
    """True iff every N-segment of a fused projection divides ``tp``
    (qkv: q|k|v by head counts from the parent attention's cfg;
    gate_up: two equal halves)."""
    if leaf == "gate_up_proj":
        return (mod.out_features // 2) % tp == 0
    from ..layers.module_utils import get_module

    parent_path = path.rsplit(".", 1)[0]
    parent = get_module(model, parent_path) if parent_path else model
    cfg = getattr(parent, "cfg", None)
    if cfg is None:
        return False
    d = cfg.head_dim
    return all((h * d) % tp == 0 for h in (cfg.num_attention_heads,
                                           cfg.num_key_value_heads))


def enable_tp_serving(model: nnx.Module, mesh: Mesh, axis: str = "model",
                      data_axis: str | None = "data") -> int:
    """Mark every WOQLinear with its TP role so its forward runs the FUSED
    per-shard Pallas kernels under shard_map (kernels/tp_matmul.py) instead
    of falling back to the XLA dequant+dot path (pjit cannot partition a
    pallas_call). Call after ``shard_model``. Returns the op count.

    qkv_proj / gate_up_proj fused projections are column-parallel (their
    N-concat segments each shard cleanly when heads divide the axis)."""
    from ..layers.module_utils import named_modules
    from ..layers.woq_linear import W4A8Linear, WOQLinear

    tp = mesh.shape[axis]
    n = 0
    for path, mod in named_modules(model):
        # WOQLinear runs the fused dequant kernels per shard; W4A8Linear
        # runs the int8-MXU kernels per shard — "tpu_strided" (shift-
        # plane) or "u4_kpack" (in-kernel bitcast: the SAME kernel class
        # as single-chip serving, since no XLA int4 view needs hoisting
        # through the shard_map). Only "s4_rowpack" cannot TP — its
        # zero-copy view must be hoisted per program.
        if type(mod) is W4A8Linear:
            if mod.layout == "s4_rowpack":
                logger.warning(
                    "enable_tp_serving: skipping %s (s4_rowpack cannot "
                    "cross a shard_map) — convert with "
                    "to_w4a8_serving(s4='u4k')", path)
                continue
            # asym W4A8 routes to the zero-point-aware dequant TP kernels
            # inside W4A8Linear.__call__; perm (GAR/act-order) is applied
            # to the activation by the TP wrappers
        elif type(mod) is not WOQLinear:
            continue
        leaf = path.rsplit(".", 1)[-1]
        K, N = mod.in_features, mod.out_features
        G = mod.group_size if mod.group_size > 0 else K
        if leaf in ("qkv_proj", "gate_up_proj"):
            # the fused segments must EACH divide tp, or every decode step
            # pays a reshard collective when the attention re-splits them
            if not _fused_segments_divide(model, path, leaf, mod, tp):
                logger.warning(
                    "enable_tp_serving: skipping %s — its fused segments "
                    "don't each divide the tp axis (%d)", path, tp)
                continue
        if leaf in COLUMN_PAR and N % tp == 0:
            mod.tp_role = ("column", axis, data_axis)
            mod.tp_mesh = mesh
            n += 1
        elif leaf in ROW_PAR and K % tp == 0 and (K // tp) % G == 0:
            mod.tp_role = ("row", axis, data_axis)
            mod.tp_mesh = mesh
            n += 1
    # fused decode attention runs per head-shard (shard_map) when heads
    # divide the TP axis
    n_attn = 0
    for path, mod in named_modules(model):
        cfg = getattr(mod, "cfg", None)
        if not type(mod).__name__.endswith("Attention") or cfg is None:
            continue
        heads = getattr(cfg, "num_attention_heads", 0)
        kv_heads = getattr(cfg, "num_key_value_heads", 0)
        if heads and kv_heads and heads % tp == 0 and kv_heads % tp == 0:
            mod.tp_mesh_attn = mesh
            mod.tp_attn_axes = (axis, data_axis)
            n_attn += 1
    logger.info("TP serving enabled on %d WOQLinear op(s), %d attention "
                "module(s) over %s", n, n_attn, dict(mesh.shape))
    return n


def make_mesh(shape: Sequence[int] | None = None,
              axis_names=("data", "model")) -> Mesh:
    """Build a mesh over all available devices. ``shape=None`` puts every
    device on the 'model' (TP) axis."""
    devs = np.array(jax.devices())
    n = devs.size
    if shape is None:
        shape = (1, n)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    return Mesh(devs.reshape(*shape), axis_names)


def _spec_for(path: tuple, value) -> P:
    parts = [str(p) for p in path]
    dotted = ".".join(parts)
    leaf = parts[-1]
    ndim = getattr(value, "ndim", 0)
    is_col = any(m in parts for m in COLUMN_PAR)
    is_row = any(m in parts for m in ROW_PAR)

    # stacked MoE experts [E, ...]: shard the EXPERT axis (EP)
    if ndim == 3 and leaf.endswith("s") \
            and any(leaf.startswith(w) for w in ("w1", "w2", "w3")):
        return P("model", None, None)
    if leaf in _WEIGHT_LEAVES and ndim == 2:
        if is_col:
            return P(None, "model")
        if is_row:
            # scales/zeros of a row-parallel weight shard on their group dim
            return P("model", None)
        return P()
    if leaf == "bias" and ndim == 1:
        return P("model") if is_col else P()
    if leaf == "embedding" and ndim == 2:
        return P(None, "model")  # shard hidden dim
    return P()  # replicate (norms, scalars, observer stats)


def state_shardings(model: nnx.Module, mesh: Mesh):
    """Flat ``[(path, NamedSharding)]`` for every array leaf of the model."""
    flat = nnx.state(model).flat_state()
    out = []
    for path, var in flat:
        spec = _spec_for(path, var[...])
        out.append((path, NamedSharding(mesh, spec)))
    return out


def shard_model(model: nnx.Module, mesh: Mesh) -> nnx.Module:
    """Device-put every param of ``model`` onto ``mesh`` per the TP rules
    (in place). Works for both fp and quantized (packed) models."""
    flat = nnx.state(model).flat_state()
    new_flat = []
    replicated: list[str] = []
    rep_bytes = 0
    for path, var in flat:
        spec = _spec_for(path, var[...])
        try:
            arr = jax.device_put(var[...], NamedSharding(mesh, spec))
        except ValueError:
            # dim not divisible by mesh axis: replicate rather than fail —
            # but surface it, replication costs mesh-size x memory
            arr = jax.device_put(var[...], NamedSharding(mesh, P()))
            if spec != P():
                replicated.append(".".join(str(p) for p in path))
                rep_bytes += arr.nbytes
        var[...] = arr
        new_flat.append((path, var))
    nnx.update(model, nnx.State.from_flat_path(new_flat))
    if replicated:
        logger.warning(
            "shard_model: %d tensor(s) (%.1f MB) could not be sharded on "
            "mesh %s (dim not divisible by axis) and were REPLICATED on "
            "every device: %s%s",
            len(replicated), rep_bytes / 1e6, dict(mesh.shape),
            ", ".join(replicated[:8]),
            " …" if len(replicated) > 8 else "")
    return model


# ---------------------------------------------------------------------------
# Multi-host (replaces the reference's torch.distributed rank/world/barrier
# plumbing — environ.py:27-32, fp8_quant/save_load.py:324-410)
# ---------------------------------------------------------------------------

def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Initialize JAX multi-host (ICI within a slice, DCN across). Returns
    (process_index, process_count). No-op on a single host."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def barrier(name: str = "nq_barrier") -> None:
    """Global host barrier (the reference's dist.barrier counterpart)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def enable_sequence_parallel(model: nnx.Module, mesh: Mesh,
                             axis: str = "model",
                             data_axis: str = "data") -> None:
    """Sequence parallelism: pin the decoder activations' token axis to
    ``axis`` (scaling-book SP recipe — the elementwise/norm work between
    matmuls shards along the sequence; XLA inserts the all-gathers
    attention needs to see the full sequence and the reduce-scatters
    back). Composes with TP weight sharding on the same mesh axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    inner = getattr(model, "model", model)
    inner.activation_sharding = NamedSharding(mesh, P(data_axis, axis, None))
