"""Why does the paged decode loop still copy the pools per layer?
Compile (no run) a tiny paged decode fori_loop for TPU and inspect the
optimized HLO for copies of pool-shaped buffers and their contexts.
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from neural_compressor_tpu.models.llama import (LlamaConfig,
                                                LlamaForCausalLM,
                                                init_paged_pool)

PAGE = 128
T = 512


def main():
    print("device:", jax.devices(), flush=True)
    cfg = LlamaConfig(vocab_size=256, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=8, num_key_value_heads=8,
                      head_dim=128, max_position_embeddings=T)
    m = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(m)
    B = 2
    pmax = T // PAGE
    n_pages = B * pmax + 1

    pools = init_paged_pool(cfg, n_pages, B, T, page_size=PAGE,
                            quantized="int8")
    bt = (1 + np.arange(B * pmax).reshape(B, pmax)).astype(np.int32)
    pools = [p._replace(block_tables=jnp.asarray(bt)) for p in pools]

    @jax.jit
    def decode(state, pools, token, steps):
        mm = nnx.merge(graphdef, state)

        def body(i, carry):
            token, pools, acc = carry
            pos = jnp.full((B,), 16 + i, jnp.int32)
            logits, pools = mm(token, positions=pos[:, None],
                               caches=pools, cache_pos=pos)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(token.dtype)
            return nxt, pools, acc + logits[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, steps, body,
                                 (token, pools, jnp.float32(0)))

    tok = jnp.zeros((B, 1), jnp.int32)
    lowered = decode.lower(state, pools, tok, 8)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO chars: {len(txt)}", flush=True)
    # pool-shaped: s8[9,8,128,128]
    pat = re.compile(r"copy[^\n]*", re.I)
    n = 0
    for line in txt.splitlines():
        ls = line.strip()
        if ls.startswith("%") or " = " in ls:
            if re.search(r"= (s8|f32|bf16)\[[^\]]*\] copy\(", ls):
                print(ls[:240], flush=True)
                n += 1
    print(f"total copy instrs: {n}", flush=True)
    with open("/tmp/paged_hlo.txt", "w") as f:
        f.write(txt)
    print("full HLO at /tmp/paged_hlo.txt", flush=True)


if __name__ == "__main__":
    main()
