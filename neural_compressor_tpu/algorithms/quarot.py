"""QuaRot-style rotation of llama-family models.

Parity target: the reference's hybrid-GPTQ QuaRot machinery
(mixed_low_precision/custom_methods/gptq.py + quarot_utils.py). A random
orthogonal rotation R is woven through the residual stream:

  * RMSNorm weights are folded into the adjacent projections first (RMS
    normalization itself is rotation-invariant: ‖xR‖ = ‖x‖)
  * embedding ← embedding·R; every residual-consuming kernel ← Rᵀ·W;
    every residual-producing kernel ← W·R; lm_head ← Rᵀ·W

The rotated model is numerically equivalent to the original (fp), but its
activations/weights have flattened outliers, which measurably improves
low-bit quantization. Run ``apply_quarot(model)`` **before** any quantize
pass (e.g. the hybrid W4A8 flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..common import logger
from ..ops.hadamard import random_orthogonal


def _fold_norm_into(norm, linears) -> None:
    w = norm.weight[...].astype(jnp.float32)
    for lin in linears:
        k = lin.kernel[...]
        lin.kernel[...] = (w[:, None] * k.astype(jnp.float32)).astype(k.dtype)
    norm.weight[...] = jnp.ones_like(norm.weight[...])


def apply_quarot(model, seed: int = 0):
    """Rotate a LlamaForCausalLM-structured model in place. Returns model."""
    cfg = model.cfg
    R = random_orthogonal(cfg.hidden_size, seed=seed)
    Rt = R.T

    def pre(lin):  # consumes the rotated residual: W <- Rt @ W
        k = lin.kernel[...]
        lin.kernel[...] = (Rt @ k.astype(jnp.float32)).astype(k.dtype)

    def post(lin):  # produces into the residual: W <- W @ R
        k = lin.kernel[...]
        lin.kernel[...] = (k.astype(jnp.float32) @ R).astype(k.dtype)

    core = getattr(model, "model", model)
    emb = core.embed_tokens.embedding[...]
    core.embed_tokens.embedding[...] = (
        emb.astype(jnp.float32) @ R).astype(emb.dtype)

    def fold_router(router, w):
        """Raw-parameter routers (deepseek): logits = x @ weight.T, so the
        norm scale folds per IN channel and the rotation rides on the
        right — (xR) @ (W R).T == x @ W.T, routing is exactly preserved."""
        wt = router.weight[...]
        router.weight[...] = (wt.astype(jnp.float32)
                              * w[None, :]).astype(wt.dtype)

    def rot_router(router):
        wt = router.weight[...]
        router.weight[...] = (wt.astype(jnp.float32) @ R).astype(wt.dtype)

    n = 0
    for layer in core.layers:
        attn = layer.self_attn
        # --- attention side: residual consumers vary by family ----------
        if getattr(attn, "kv_a_proj_with_mqa", None) is not None:  # MLA
            q_in = attn.q_proj if getattr(attn, "q_proj", None) is not None \
                else attn.q_a_proj
            attn_pre = [q_in, attn.kv_a_proj_with_mqa]
        else:  # llama/mixtral-shaped
            attn_pre = [attn.q_proj, attn.k_proj, attn.v_proj]
        _fold_norm_into(layer.input_layernorm, attn_pre)
        for lin in attn_pre:
            pre(lin)
        post(attn.o_proj)
        # --- mlp side: dense MLP, mixtral MoE, or deepseek MoE ----------
        mlp = getattr(layer, "mlp", None) or layer.block_sparse_moe
        if hasattr(mlp, "experts"):
            experts = list(mlp.experts)
            if hasattr(experts[0], "w1"):      # mixtral: w1/w3 in, w2 out
                ins = [e.w1 for e in experts] + [e.w3 for e in experts]
                outs = [e.w2 for e in experts]
            else:                              # deepseek expert MLPs
                ins = ([e.gate_proj for e in experts]
                       + [e.up_proj for e in experts])
                outs = [e.down_proj for e in experts]
            shared = getattr(mlp, "shared_experts", None)
            if shared is not None:
                ins += [shared.gate_proj, shared.up_proj]
                outs.append(shared.down_proj)
            router = mlp.gate
            if hasattr(router, "kernel"):      # Linear router (mixtral)
                ins.append(router)
                wnorm = layer.post_attention_layernorm
                _fold_norm_into(wnorm, ins)
            else:                              # raw-parameter router
                wnorm = layer.post_attention_layernorm
                w = wnorm.weight[...].astype(jnp.float32)
                _fold_norm_into(wnorm, ins)
                fold_router(router, w)
                rot_router(router)
            for lin in ins:
                pre(lin)
            for lin in outs:
                post(lin)
        else:
            _fold_norm_into(layer.post_attention_layernorm,
                            [mlp.gate_proj, mlp.up_proj])
            for lin in (mlp.gate_proj, mlp.up_proj):
                pre(lin)
            post(mlp.down_proj)
        n += 1

    if model.lm_head is not None:
        _fold_norm_into(core.norm, [model.lm_head])
        pre(model.lm_head)
    else:  # tied embeddings: fold the final norm into... not supported
        logger.warning("quarot: tied lm_head — final norm left unfolded")

    logger.info("QuaRot: rotated %d layers (hidden=%d)", n, cfg.hidden_size)
    return model
