"""A/B the RO-attention cache space on the REAL llama3-8b decode."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, functools
from flax import nnx
import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized, init_kv_cache)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     to_w4a8_serving, s4_prepare)
from neural_compressor_tpu.kernels.decode_attention import set_ro_cache_space

PRESET = sys.argv[1] if len(sys.argv) > 1 else "llama3-8b"
qmodel = build_quantized(LlamaConfig(**LLAMA_PRESETS[PRESET]),
                         nq.RTNConfig(dtype="int4", group_size=128,
                                      quant_lm_head=True))
fuse_for_serving(qmodel); to_w4a8_serving(qmodel); enable_fused_decode(qmodel)
graphdef, state = nnx.split(qmodel)
cfg = qmodel.cfg

def bench(space):
    set_ro_cache_space(space)

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
    def decode(state, caches, token, steps):
        m = nnx.merge(graphdef, state)
        s4_prepare(m)
        def body(i, carry):
            token, caches, acc = carry
            logits, caches = m(token, positions=jnp.full((1,1), i, jnp.int32),
                               caches=caches, cache_pos=i)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(token.dtype)
            return nxt, caches, acc + logits[0,0,0].astype(jnp.float32)
        return jax.lax.fori_loop(0, steps, body, (token, caches, jnp.float32(0)))

    tok = jnp.zeros((1,1), jnp.int32)
    t0 = time.time()
    _,_,acc = decode(state, init_kv_cache(cfg,1,1024), tok, 4)
    _ = np.asarray(acc)
    print(f"[{space}] compile {time.time()-t0:.0f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        _,_,acc = decode(state, init_kv_cache(cfg,1,1024), tok, 256)
        _ = np.asarray(acc)
        dt = (time.time()-t0)/256
        print(f"[{space}] {dt*1e3:.3f} ms/step ({1/dt:.1f} tok/s)", flush=True)

print("device:", jax.devices(), flush=True)
bench("vmem")
bench("hbm")
bench("vmem")
