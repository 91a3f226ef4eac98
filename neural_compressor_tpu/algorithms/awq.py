"""AWQ — activation-aware weight quantization.

Parity target: reference ``ActAwareWeightQuant``
(neural_compressor/torch/algorithms/weight_only/awq.py:199-361): 20-point
grid over s = x_maxᵅ / w_maxଵ⁻ᵅ, MSE vs the fp output, scale folding into
the parent op, per-channel clip search; absorb-pair discovery via
torch.jit trace (weight_only/utility.py:728-986).

TPU redesign: no graph tracing — absorb groups come from a **declarative
per-architecture map** (llama/gpt2 patterns built in, user-extensible via
``AWQConfig.absorb_layer_dict``); layers whose scales cannot be absorbed
get a runtime ``pre_scale`` on the quantized module (XLA fuses the divide).
The α-grid search is a single jitted ``lax.map`` over the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import logger
from ..layers.module_utils import get_module, named_modules, replace_module
from ..layers.observers import ObserverStat
from ..layers.woq_linear import WOQLinear
from ..ops.qtensor import quantize_tensor
from . import register_algo
from .calib_capture import CalibCaptureState, find_target_blocks, run_capture
from .utils import extract_linear, dump_op_stats

_FLOAT_SKIP = ("fp32", "bf16", "fp16", "float32", "bfloat16", "float16")

# Declarative absorb maps: (parent_path, [children sharing the scaled input],
# kind). kind "norm": divide the norm weight by s; "prev_linear": divide the
# parent linear's output columns by s. Matches the reference's absorb dicts
# (weight_only/utility.py:728-986 discovers the same pairs by jit trace).
#
# Every child consuming the scaled input MUST be listed — apply_absorb_fold
# compensates unquantized siblings — so parallel-residual blocks (gptj,
# phi, falcon-parallel) list the MLP entry linear alongside q/k/v. A map
# value may be a callable(block) -> patterns for config-dependent wiring.
#
# MLP down-projections: llama-style gated MLPs absorb into up_proj
# (silu(g)*u is linear in u) and ReLU MLPs (opt) absorb through the
# positively-homogeneous activation, but gelu MLPs (gpt2/bloom/falcon/
# gptj/neox/phi) cannot absorb fc -> proj through the nonlinearity — the
# reference finds none there either; those fall back to pre_scale (AWQ)
# or stay unsmoothed (SmoothQuant).


def _falcon_patterns(block):
    if getattr(block.cfg, "parallel_attn", True):
        # ONE norm feeds attention AND the MLP (parallel residual)
        return [("input_layernorm",
                 ["self_attention.query_key_value", "mlp.dense_h_to_4h"],
                 "norm")]
    return [
        ("input_layernorm", ["self_attention.query_key_value"], "norm"),
        ("post_attention_layernorm", ["mlp.dense_h_to_4h"], "norm"),
    ]


ABSORB_PATTERNS = {
    "LlamaDecoderLayer": [
        ("input_layernorm",
         ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"], "norm"),
        ("self_attn.v_proj", ["self_attn.o_proj"], "prev_linear"),
        ("post_attention_layernorm", ["mlp.gate_proj", "mlp.up_proj"], "norm"),
        ("mlp.up_proj", ["mlp.down_proj"], "prev_linear"),
    ],
    "GPT2Block": [
        ("ln_1", ["attn.c_attn"], "norm"),
        ("ln_2", ["mlp.c_fc"], "norm"),
    ],
    "OPTDecoderLayer": [
        ("self_attn_layer_norm",
         ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
         "norm"),
        ("self_attn.v_proj", ["self_attn.out_proj"], "prev_linear"),
        ("final_layer_norm", ["fc1"], "norm"),
        # OPT's MLP is ReLU, which is positively homogeneous
        # (relu(z)/s == relu(z/s) for s > 0), so fc2's input scale absorbs
        # through the activation into fc1's output columns
        ("fc1", ["fc2"], "prev_linear"),
    ],
    "BloomBlock": [
        # qkv is head-fused ([H, 3, D] columns): norm absorb is safe (all
        # columns share the input); v->dense is not (v rows interleaved)
        ("input_layernorm", ["self_attention.query_key_value"], "norm"),
        ("post_attention_layernorm", ["mlp.dense_h_to_4h"], "norm"),
    ],
    "FalconDecoderLayer": _falcon_patterns,
    "GPTJBlock": [
        # parallel residual: ln_1 feeds q/k/v AND fc_in
        ("ln_1", ["attn.q_proj", "attn.k_proj", "attn.v_proj", "mlp.fc_in"],
         "norm"),
        ("attn.v_proj", ["attn.out_proj"], "prev_linear"),
    ],
    "GPTNeoXBlock": [
        ("input_layernorm", ["attention.query_key_value"], "norm"),
        ("post_attention_layernorm", ["mlp.dense_h_to_4h"], "norm"),
    ],
    "PhiBlock": [
        # one norm feeds both branches (parallel residual)
        ("input_layernorm",
         ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
          "mlp.fc1"], "norm"),
        ("self_attn.v_proj", ["self_attn.dense"], "prev_linear"),
    ],
    "MixtralDecoderLayer": lambda block: _mixtral_patterns(block),
    "GemmaDecoderLayer": lambda block: _gemma_patterns(block),
}


def _gemma_patterns(block):
    # gemma-2/3 norm the MLP input with pre_feedforward_layernorm; gemma-1
    # reuses post_attention_layernorm (llama-style). GeGLU is linear in
    # up_proj, so down's input scale absorbs into up like llama's SwiGLU.
    pre_mlp = ("pre_feedforward_layernorm" if block.cfg.use_post_norms
               else "post_attention_layernorm")
    return [
        ("input_layernorm",
         ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
         "norm"),
        ("self_attn.v_proj", ["self_attn.o_proj"], "prev_linear"),
        (pre_mlp, ["mlp.gate_proj", "mlp.up_proj"], "norm"),
        ("mlp.up_proj", ["mlp.down_proj"], "prev_linear"),
    ]


def _mixtral_patterns(block):
    pats = [
        ("input_layernorm",
         ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
         "norm"),
        ("self_attn.v_proj", ["self_attn.o_proj"], "prev_linear"),
    ]
    moe = block.block_sparse_moe
    if type(moe).__name__ != "MixtralSparseMoeBlock":
        return pats  # stacked serving form: scales live inside the stack
    n_exp = len(moe.experts)
    # the post norm feeds the router gate AND every expert's w1/w3
    pats.append((
        "post_attention_layernorm",
        ["block_sparse_moe.gate"] + [
            f"block_sparse_moe.experts.{e}.{w}"
            for e in range(n_exp) for w in ("w1", "w3")], "norm"))
    pats += [(f"block_sparse_moe.experts.{e}.w3",
              [f"block_sparse_moe.experts.{e}.w2"], "prev_linear")
             for e in range(n_exp)]
    return pats


@jax.jit
def _amax_sample_update(amax, x):
    """One fused dispatch per replayed batch (eager ops are ~0.3 s each in
    this environment): new per-channel amax + the flattened f32 sample."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return jnp.maximum(amax, jnp.max(jnp.abs(x2), axis=0)), x2


class ActStatObserver(nnx.Module):
    """Wraps a Linear: records per-channel amax and an input sample."""

    def __init__(self, inner: nnx.Module, in_features: int,
                 max_sample_rows: int = 512):
        self.inner = inner
        self.amax = ObserverStat(jnp.zeros((in_features,), jnp.float32))
        self.max_sample_rows = max_sample_rows
        self._samples: list = []
        self._sample_rows = 0

    def __call__(self, x, *args, **kwargs):
        self.amax[...], x2 = _amax_sample_update(self.amax[...], x)
        if self._sample_rows < self.max_sample_rows:
            self._samples.append(x2)
            self._sample_rows += x2.shape[0]
        return self.inner(x, *args, **kwargs)

    def sample(self) -> jax.Array | None:
        """Calibration sample rows, or None if this module was never hit
        during replay (e.g. an expert the router never selected)."""
        if not self._samples:
            return None
        x = jnp.concatenate(self._samples, axis=0)
        return x[: self.max_sample_rows]


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "scheme", "wdtype", "n_grid"),
)
def awq_search_scale(X, Ws, x_amax, *, bits, group_size, scheme, wdtype,
                     n_grid=20):
    """Grid-search α for one absorb group.

    X: [S, K] input sample; Ws: [K, Ntot] concat of the group's kernels.
    Returns (best_scale [K], best_loss). Reference: search_scale
    (awq.py:264-361), n_grid=20.
    """
    w_amax = jnp.max(jnp.abs(Ws), axis=1)  # [K]
    w_amax = jnp.where(w_amax <= 0, 1e-8, w_amax)
    xa = jnp.where(x_amax <= 0, 1e-8, x_amax)
    Y = X @ Ws

    def loss_for(alpha):
        s = xa**alpha / w_amax ** (1.0 - alpha)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        s = jnp.clip(s, 1e-4, 1e4)
        Wq = _qdq(Ws * s[:, None], bits, group_size, scheme, wdtype) / s[:, None]
        return jnp.sum((X @ Wq - Y) ** 2), s

    alphas = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
    losses, scales = jax.lax.map(loss_for, alphas)
    best = jnp.argmin(losses)
    return scales[best], losses[best]


def _qdq(W, bits, group_size, scheme, wdtype):
    """In-graph QDQ (works under jit; mirrors ops.qtensor.qdq_tensor)."""
    from ..ops.qtensor import (_int_sym_arrays, _int_asym_arrays,
                               _codebook_arrays, CODEBOOKS,
                               FLOAT_CODE_DTYPES, _resolve_group)
    K, N = W.shape
    G = _resolve_group(K, group_size)
    if wdtype in FLOAT_CODE_DTYPES:
        codes, scale = _codebook_arrays(W, wdtype, G)
        vals = CODEBOOKS[wdtype][codes.astype(jnp.int32).reshape(-1, G, N)]
        return (vals * scale[:, None, :]).reshape(-1, N)[:K]
    if scheme == "sym":
        codes, scale = _int_sym_arrays(W, bits, G, False)
        vals = codes.astype(jnp.float32).reshape(-1, G, N)
        return (vals * scale[:, None, :]).reshape(-1, N)[:K]
    codes, scale, zeros = _int_asym_arrays(W, bits, G)
    vals = codes.astype(jnp.float32).reshape(-1, G, N) - zeros[:, None, :]
    return (vals * scale[:, None, :]).reshape(-1, N)[:K]


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "scheme", "wdtype", "n_grid",
                     "max_shrink"),
)
def awq_search_clip(X, W, *, bits, group_size, scheme, wdtype, n_grid=10,
                    max_shrink=0.5):
    """Per-(group, out-channel) clip ratio minimizing ||X(Wq − W)||².

    Output-MSE variant of the reference clip search (awq.py auto_clip),
    approximating cross-group independence: the loss of group g's clip is
    ‖X[:, g] (Wq−W)[g]‖² per output channel.
    """
    K, N = W.shape
    G = group_size if group_size > 0 else K
    ng = K // G if K % G == 0 else -(-K // G)
    pad = ng * G - K
    Wp = jnp.pad(W, ((0, pad), (0, 0)))
    Xp = jnp.pad(X, ((0, 0), (0, pad)))
    Wg = Wp.reshape(ng, G, N)
    Xg = Xp.reshape(X.shape[0], ng, G)
    absmax = jnp.max(jnp.abs(Wg), axis=1, keepdims=True)
    ratios = 1.0 - jnp.arange(n_grid, dtype=jnp.float32) * (max_shrink / n_grid)

    def loss_for(r):
        lim = absmax * r
        Wc = jnp.clip(Wg, -lim, lim).reshape(ng * G, N)
        Wq = _qdq(Wc, bits, group_size, scheme, wdtype).reshape(ng, G, N)
        diff = Wq - Wg  # [ng, G, N]
        err = jnp.einsum("sng,ngN->snN", Xg, diff)
        return jnp.sum(err**2, axis=0)  # [ng, N]

    losses = jax.lax.map(loss_for, ratios)  # [n_grid, ng, N]
    best = jnp.argmin(losses, axis=0)
    lim = absmax[:, 0, :] * ratios[best]  # [ng, N]
    lim_rows = jnp.repeat(lim, G, axis=0)[:K]
    return jnp.clip(W, -lim_rows, lim_rows)


_awq_captures: dict[int, CalibCaptureState] = {}


def _absorb_groups_for_block(block, block_path, cfg):
    """Resolve absorb groups: declarative pattern for known block types,
    else one singleton group per linear (runtime pre_scale)."""
    btype = type(block).__name__
    patterns = cfg.absorb_layer_dict.get(btype) or ABSORB_PATTERNS.get(btype)
    if callable(patterns):
        patterns = patterns(block)
    groups = []
    used = set()
    if patterns:
        for parent, children, kind in patterns:
            ok = all(_has(block, c) for c in children) and _has(block, parent)
            if not ok:
                continue
            groups.append((parent, list(children), kind))
            used.update(children)
    for sub_path, sub in named_modules(block):
        if sub_path and sub_path not in used and extract_linear(sub) is not None:
            groups.append((None, [sub_path], "pre_scale"))
    return groups


def _param_value(pm, name):
    """Unwrap an nnx.Param-like attribute's value, tolerating absent attrs
    and Params wrapping None (e.g. nnx.LayerNorm with use_bias=False)."""
    p = getattr(pm, name, None)
    if p is None:
        return None, None
    try:
        v = p[...]
    except (TypeError, IndexError):
        return None, None
    return (p, v) if v is not None else (None, None)


def _norm_scale_attr(pm) -> str | None:
    """Name of the norm's multiplicative parameter: 'weight' for
    RMSNorm-style modules (models/llama.py), 'scale' for nnx.LayerNorm."""
    for name in ("weight", "scale"):
        if _param_value(pm, name)[1] is not None:
            return name
    return None


def apply_absorb_fold(block, parent, children, members, kind, s) -> bool:
    """Fold 1/s into ``parent`` so every child of the absorb group sees x/s.

    ``members`` are the children being quantized (their kernels get the
    matching *s fold by their caller); any other child of the group stays
    fp and is compensated here by scaling its kernel rows by s, so a
    partially-quantized group (e.g. k_proj kept fp via a local override)
    cannot be silently corrupted. For nnx.LayerNorm parents the elementwise
    bias is divided too (LN output is normalized*scale + bias). Returns
    False — nothing mutated — when shapes/attrs make the fold impossible.
    """
    comp = []
    for c in children:
        if c in members:
            continue
        m = get_module(block, c)
        lin = extract_linear(m)
        if (lin is None or getattr(m, "kernel", None) is None
                or lin[0].shape[0] != s.shape[0]):
            return False
        comp.append(m)
    if kind == "norm":
        pm = get_module(block, parent)
        attr = _norm_scale_attr(pm)
        if attr is None:
            return False
        p, pv = _param_value(pm, attr)
        if pv.shape != s.shape:
            return False
        # norms whose effective multiplier is (w + off), e.g. gemma's
        # (1 + w) RMSNorm, declare weight_offset; the stored param becomes
        # (w + off)/s - off so the module still computes (x_n * (w' + off))
        off = float(getattr(pm, "weight_offset", 0.0))
        p[...] = ((pv.astype(jnp.float32) + off) / s - off).astype(pv.dtype)
        b, bv = _param_value(pm, "bias")
        if bv is not None and bv.shape == s.shape:
            b[...] = (bv.astype(jnp.float32) / s).astype(bv.dtype)
    elif kind == "prev_linear":
        pm = get_module(block, parent)
        lin = extract_linear(pm)
        if (lin is None or lin[0].shape[1] != s.shape[0]
                or getattr(pm, "kernel", None) is None):
            return False
        pk, pb = lin
        pm.kernel[...] = (pk.astype(jnp.float32)
                          / s[None, :]).astype(pm.kernel[...].dtype)
        if pb is not None:
            pm.bias[...] = (pb.astype(jnp.float32) / s).astype(
                pm.bias[...].dtype)
    else:
        return False
    for m in comp:
        k = m.kernel[...]
        m.kernel[...] = (k.astype(jnp.float32) * s[:, None]).astype(k.dtype)
    return True


def _has(block, path):
    try:
        return get_module(block, path) is not None
    except (AttributeError, KeyError):
        return False


@register_algo("awq")
def awq_entry(model, configs_mapping, mode="quantize", run_fn=None,
              run_args=None, example_inputs=None, config=None):
    if mode == "prepare":
        blocks = find_target_blocks(model)
        assert blocks is not None, "AWQ requires a transformer block list"
        st = CalibCaptureState(model, *blocks)
        st.attach()
        _awq_captures[id(model)] = st
        return model
    if mode == "convert":
        st = _awq_captures.pop(id(model), None)
        assert st is not None, "convert() before prepare() for AWQ"
        captured = st.detach()
        return _convert(model, st.block_paths, captured, configs_mapping)

    blocks = find_target_blocks(model)
    assert blocks is not None, "AWQ requires a transformer block list"
    st = CalibCaptureState(model, *blocks)
    captured = run_capture(model, st, run_fn, run_args)
    assert captured, "AWQ calibration captured no batches"
    return _convert(model, st.block_paths, captured, configs_mapping)


def _convert(model, block_paths, captured, configs_mapping):
    cfg_by_name = {name: c for (name, _t), c in configs_mapping.items()}
    n_done = 0
    inputs = captured

    for bi, bpath in enumerate(block_paths):
        block = get_module(model, bpath)
        # observe inputs of every target linear in the block
        targets = {}
        for sub_path, sub in named_modules(block):
            if not sub_path:
                continue
            full = f"{bpath}.{sub_path}"
            cfg = cfg_by_name.get(full)
            if cfg is None or cfg.dtype in _FLOAT_SKIP:
                continue
            if extract_linear(sub) is None:
                continue
            targets[sub_path] = cfg
        if targets:
            for sub_path in targets:
                sub = get_module(block, sub_path)
                k, _ = extract_linear(sub)
                replace_module(block, sub_path, ActStatObserver(sub, k.shape[0]))
            for args, kwargs in inputs:
                block(*args, **kwargs)
            # strip observers, keep stats; targets never hit during replay
            # (e.g. experts the router skipped) stay fp
            stats = {}
            for sub_path in list(targets):
                obs = get_module(block, sub_path)
                sample = obs.sample()
                replace_module(block, sub_path, obs.inner)
                if sample is None:
                    logger.warning(
                        "AWQ: %s.%s received no calibration batches — "
                        "leaving it unquantized", bpath, sub_path)
                    del targets[sub_path]
                    continue
                stats[sub_path] = (obs.amax[...], sample)

            # pass A: search + fold every group's scale while all parents
            # are still fp (reference order: apply_scale then quantize,
            # awq.py:253-262)
            any_cfg = next(iter(targets.values()))
            scale_of: dict[str, tuple] = {}
            for parent, children, kind in _absorb_groups_for_block(
                    block, bpath, any_cfg):
                members = [c for c in children if c in targets]
                if not members:
                    continue
                cfg = targets[members[0]]
                kernels = [extract_linear(get_module(block, c))[0].astype(jnp.float32)
                           for c in members]
                Ws = jnp.concatenate(kernels, axis=1)
                amax, X = stats[members[0]]
                if cfg.use_auto_scale:
                    s, _loss = awq_search_scale(
                        X, Ws, amax, bits=cfg.weight_bits,
                        group_size=cfg.group_size, scheme=cfg.scheme,
                        wdtype=cfg.weight_dtype, n_grid=cfg.n_grid)
                else:
                    s = jnp.ones((Ws.shape[0],), jnp.float32)

                pre_scale = None
                if not apply_absorb_fold(block, parent, children, members,
                                         kind, s):
                    # shapes don't permit folding (e.g. GQA v->o with head
                    # repetition, or an unfoldable fp sibling in the
                    # group): apply at runtime instead
                    pre_scale = s
                for c in members:
                    scale_of[c] = (s, pre_scale, X)

            # pass B: quantize every target with its (already scaled) kernel
            for c, cfg in targets.items():
                sub = get_module(block, c)
                kernel, bias = extract_linear(sub)
                s, pre_scale, X = scale_of.get(
                    c, (jnp.ones((kernel.shape[0],), jnp.float32), None,
                        stats[c][1]))
                Wsc = kernel.astype(jnp.float32) * s[:, None]
                if cfg.use_auto_clip:
                    # the scaled weight W·s consumes x/s
                    Wsc = awq_search_clip(
                        X / s[None, :], Wsc,
                        bits=cfg.weight_bits, group_size=cfg.group_size,
                        scheme=cfg.scheme, wdtype=cfg.weight_dtype)
                qt = quantize_tensor(
                    Wsc, bits=cfg.weight_bits, group_size=cfg.group_size,
                    scheme=cfg.scheme, dtype=cfg.weight_dtype)
                replace_module(block, c, WOQLinear.from_qtensor(
                    qt, bias=bias, pre_scale=pre_scale))
                n_done += 1
        if bi + 1 < len(block_paths):
            from .gptq import _as_next_input
            inputs = [(_as_next_input(block(*args, **kwargs), args), kwargs)
                      for args, kwargs in inputs]

    logger.info("AWQ quantized %d Linear ops over %d blocks",
                n_done, len(block_paths))
    dump_op_stats(model)
    return model
