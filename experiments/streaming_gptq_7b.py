"""Streaming GPTQ of a full llama2-7b checkpoint on ONE 16 GB chip.

Fabricates a random HF-layout llama2-7b checkpoint on disk (13.5 GB bf16),
then runs the calibrated streaming GPTQ path: each decoder layer is built,
loaded from the shards, Hessian-calibrated on streamed hidden states,
quantized and written out — device peak is one fp layer + observers
(~1.5 GB), never the 13.5 GB model.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import neural_compressor_tpu as nq

SRC = "/root/ckpt_7b_src"
OUT = "/root/ckpt_7b_gptq"
H, I, L, V = 4096, 11008, 32, 32000


def write_checkpoint():
    from safetensors.numpy import save_file

    os.makedirs(SRC, exist_ok=True)
    rng = np.random.default_rng(0)

    def t(*shape, scale=0.02):
        a = (rng.standard_normal(np.prod(shape)).astype(np.float32) * scale)
        return jnp.asarray(a.reshape(shape), dtype=jnp.bfloat16)

    def store(d, name, arr):
        d[name + "?bf16"] = np.asarray(arr).view(np.uint16)

    weight_map = {}
    t0 = time.time()
    for li in range(L):
        shard = f"model-{li:05d}.safetensors"
        d = {}
        base = f"model.layers.{li}."
        for nm, shape in (("self_attn.q_proj.weight", (H, H)),
                          ("self_attn.k_proj.weight", (H, H)),
                          ("self_attn.v_proj.weight", (H, H)),
                          ("self_attn.o_proj.weight", (H, H)),
                          ("mlp.gate_proj.weight", (I, H)),
                          ("mlp.up_proj.weight", (I, H)),
                          ("mlp.down_proj.weight", (H, I))):
            store(d, base + nm, t(*shape))
            weight_map[base + nm] = shard
        for nm in ("input_layernorm.weight", "post_attention_layernorm.weight"):
            d[base + nm] = np.ones((H,), np.float32)
            weight_map[base + nm] = shard
        # safetensors keys can't contain '?': rename on save
        d = {k.replace("?bf16", ""): v for k, v in d.items()}
        save_file(d, os.path.join(SRC, shard))
        if li % 8 == 0:
            print(f"  wrote layer {li} shard ({time.time()-t0:.0f}s)",
                  flush=True)
    shard = "model-head.safetensors"
    d = {"model.embed_tokens.weight": np.asarray(t(V, H)).view(np.uint16),
         "model.norm.weight": np.ones((H,), np.float32),
         "lm_head.weight": np.asarray(t(V, H)).view(np.uint16)}
    save_file(d, os.path.join(SRC, shard))
    for nm in d:
        weight_map[nm] = shard
    with open(os.path.join(SRC, "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with open(os.path.join(SRC, "config.json"), "w") as f:
        json.dump({"architectures": ["LlamaForCausalLM"],
                   "model_type": "llama", "vocab_size": V,
                   "hidden_size": H, "intermediate_size": I,
                   "num_hidden_layers": L, "num_attention_heads": 32,
                   "num_key_value_heads": 32,
                   "max_position_embeddings": 4096,
                   "rms_norm_eps": 1e-5, "rope_theta": 10000.0}, f)
    print(f"checkpoint written in {time.time()-t0:.0f}s", flush=True)


def main():
    print("device:", jax.devices(), flush=True)
    if not os.path.exists(os.path.join(SRC, "config.json")):
        write_checkpoint()
    calib = np.random.default_rng(1).integers(0, V, (4, 512))
    t0 = time.time()
    nq.gptq_quantize_checkpoint_streaming(
        SRC, nq.GPTQConfig(dtype="int4", group_size=128, block_size=128),
        OUT, calib)
    dt = time.time() - t0
    print(f"STREAMING GPTQ llama2-7b: {dt:.0f}s total "
          f"({dt/L:.1f}s/layer)", flush=True)
    import subprocess
    out = subprocess.run(["du", "-sh", OUT], capture_output=True, text=True)
    print("output size:", out.stdout.strip(), flush=True)


if __name__ == "__main__":
    main()
