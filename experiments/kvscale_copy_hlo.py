"""Does the contiguous int8-KV B=1 fused decode path re-materialize its
[B, Hkv, T, 1] scale operands (the lane-pad phantom found in the paged
path)? Compile a tiny int8-KV decode loop for TPU and grep the HLO.
If present, this is why "int8-KV loses at B=1" (PERF_NOTES round 3).
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LlamaConfig,
                                                LlamaForCausalLM,
                                                init_kv_cache)

T = 512


def main():
    print("device:", jax.devices(), flush=True)
    cfg = LlamaConfig(vocab_size=256, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=8,
                      head_dim=128, max_position_embeddings=T)
    m = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    m = nq.quantize(m, nq.KVCacheQuantConfig(dtype="int8"))
    graphdef, state = nnx.split(m)
    B = 1

    @jax.jit
    def decode(state, caches, token, steps):
        mm = nnx.merge(graphdef, state)

        def body(i, carry):
            token, caches, acc = carry
            pos = jnp.full((B, 1), 16 + i, jnp.int32)
            logits, caches = mm(token, positions=pos, caches=caches,
                                cache_pos=16 + i)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(token.dtype)
            return nxt, caches, acc + logits[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, steps, body,
                                 (token, caches, jnp.float32(0)))

    caches = init_kv_cache(cfg, B, T, quantized="int8")
    tok = jnp.zeros((B, 1), jnp.int32)
    compiled = decode.lower(state, caches, tok, 8).compile()
    txt = compiled.as_text()
    print(f"HLO chars: {len(txt)}", flush=True)
    pat = re.compile(r"= (f32|s8|bf16)\[[0-9,]*1\][^ ]* copy\(")
    n = 0
    for line in txt.splitlines():
        if pat.search(line):
            print(line.strip()[:200], flush=True)
            n += 1
    print(f"trailing-1 copies: {n}", flush=True)
    with open("/tmp/kvscale_hlo.txt", "w") as f:
        f.write(txt)


if __name__ == "__main__":
    main()
