"""int4-KV quantizer variants on tiny_gqa (round-5 VERDICT #4).

Emulation: QDQ the K/V tensors inside the PARALLEL attention path with
each candidate quantizer and measure ppl — decode-with-quantized-cache
quantizes each row once at write time, which is the same per-token QDQ,
so parallel-QDQ Δppl tracks the decode battery numbers (validated: the
sym variant reproduces the +0.15 battery reading).
"""
import sys, os
sys.path.insert(0, "/root/repo")
if os.environ.get("KVV_CPU", "1") == "1":
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    import jax; jax.config.update("jax_platforms", "cpu")
import jax, jax.numpy as jnp, numpy as np
import neural_compressor_tpu as nq
from neural_compressor_tpu.evaluation.lm_eval import perplexity
from neural_compressor_tpu.evaluation.train_tiny import frozen_corpus, load_tiny_model, load_tiny_lm
from neural_compressor_tpu.models import llama as L

def qdq_sym(x, axis_groups=1):
    # sym per-(token, head, D-group); axis_groups groups along D
    xf = x.astype(jnp.float32)
    B, H, T, D = xf.shape
    g = xf.reshape(B, H, T, axis_groups, D // axis_groups)
    amax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    s = jnp.where(amax <= 0, 1.0, amax / 7.0)
    c = jnp.clip(jnp.round(g / s), -8, 7)
    return (c * s).reshape(B, H, T, D).astype(x.dtype)

def qdq_asym(x, axis_groups=1):
    xf = x.astype(jnp.float32)
    B, H, T, D = xf.shape
    g = xf.reshape(B, H, T, axis_groups, D // axis_groups)
    mn = jnp.min(g, axis=-1, keepdims=True)
    mx = jnp.max(g, axis=-1, keepdims=True)
    s = jnp.where(mx - mn <= 0, 1.0, (mx - mn) / 15.0)
    c = jnp.clip(jnp.round((g - mn) / s), 0, 15)
    return (c * s + mn).reshape(B, H, T, D).astype(x.dtype)

def qdq_int8(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax <= 0, 1.0, amax / 127.0)
    return (jnp.clip(jnp.round(xf / s), -128, 127) * s).astype(x.dtype)

def center_k(mu):
    # softmax-invariant static centering: quantize (k - mu), attend on it
    def f(k):
        return qdq_sym(k - mu[None, :, None, :]).astype(k.dtype)
    return f

VARIANTS = {
    "sym_pt (current)":        (lambda k: qdq_sym(k), lambda v: qdq_sym(v)),
    "asym_pt":                 (lambda k: qdq_asym(k), lambda v: qdq_asym(v)),
    "sym_half (2 D-groups)":   (lambda k: qdq_sym(k, 2), lambda v: qdq_sym(v, 2)),
    "asym_half":               (lambda k: qdq_asym(k, 2), lambda v: qdq_asym(v, 2)),
    "sym_g32 (D/32 groups)":   (lambda k: qdq_sym(k, 4), lambda v: qdq_sym(v, 4)),
    "asym_g32":                (lambda k: qdq_asym(k, 4), lambda v: qdq_asym(v, 4)),
    "k_int8+v_int4":           (qdq_int8, lambda v: qdq_sym(v)),
    "k_int4+v_int8":           (lambda k: qdq_sym(k), qdq_int8),
    "k_asymhalf+v_symhalf":    (lambda k: qdq_asym(k, 2), lambda v: qdq_sym(v, 2)),
}

orig_ga = L._grouped_attention

def run(fam):
    m = load_tiny_lm() if fam == "tiny_lm" else load_tiny_model(fam)
    train, val = frozen_corpus()
    val = val[:96]
    p_fp = perplexity(m, val, batch_size=16)
    print(f"{fam}: fp ppl {p_fp:.4f}", flush=True)
    D = m.cfg.head_dim if hasattr(m.cfg, "head_dim") else m.cfg.hidden_size // m.cfg.num_attention_heads
    results = {}
    for name, (fk, fv) in VARIANTS.items():
        def patched(q, k, v, mask, D_, k_scale=None, v_scale=None):
            return orig_ga(q, fk(k), fv(v), mask, D_)
        L._grouped_attention = patched
        try:
            p = perplexity(m, val, batch_size=16)
        finally:
            L._grouped_attention = orig_ga
        results[name] = p - p_fp
        print(f"  {name:26s} d={p - p_fp:+.4f}", flush=True)
    return results

if __name__ == "__main__":
    for fam in sys.argv[1:] or ["tiny_gqa"]:
        run(fam)
