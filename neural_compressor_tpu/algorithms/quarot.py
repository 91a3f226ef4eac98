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

    n = 0
    for layer in core.layers:
        attn, mlp = layer.self_attn, layer.mlp
        _fold_norm_into(layer.input_layernorm,
                        [attn.q_proj, attn.k_proj, attn.v_proj])
        _fold_norm_into(layer.post_attention_layernorm,
                        [mlp.gate_proj, mlp.up_proj])
        for lin in (attn.q_proj, attn.k_proj, attn.v_proj,
                    mlp.gate_proj, mlp.up_proj):
            pre(lin)
        for lin in (attn.o_proj, mlp.down_proj):
            post(lin)
        n += 1

    if model.lm_head is not None:
        _fold_norm_into(core.norm, [model.lm_head])
        pre(model.lm_head)
    else:  # tied embeddings: fold the final norm into... not supported
        logger.warning("quarot: tied lm_head — final norm left unfolded")

    logger.info("QuaRot: rotated %d layers (hidden=%d)", n, cfg.hidden_size)
    return model
