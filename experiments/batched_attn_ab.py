"""Round-4: batched flash-decode attention kernel A/B on the real chip.

Full-model decode (W4A8 serving, quantized lm_head, int8 KV, T=1024),
kernel ON (bh-tiled flash decode, kernels/decode_attention.py
batched_decode_attention) vs OFF (XLA einsum on cache codes), at the
batch sizes VERDICT names (llama2 B in {8,16,64}; llama3-8b B in
{16,128}). Target: B=16 llama2 > 900 tok/s.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import decode_attention as da
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode

STEPS = 64
MAX_LEN = 1024


def run(model, batch, steps=STEPS):
    state, make_caches, decode = build_decode(model, batch, MAX_LEN,
                                              quant_kv=True)
    tok = jnp.zeros((batch, 1), dtype=jnp.int32)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    compile_s = time.time() - t0
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, steps)
    _ = np.asarray(acc)
    dt = time.time() - t0
    return dt / steps * 1e3, batch * steps / dt, compile_s


def main():
    import os
    print("device:", jax.devices(), flush=True)
    # one preset per process (pass PRESET=...): a failed/OOM'd config can
    # leave the allocator pinned and starve the NEXT model's build
    only = os.environ.get("PRESET")
    # llama2 B=64 omitted: MHA int8 cache alone is 64 x 0.27 GB = 17 GB
    configs = (("llama2-7b", (8, 16)), ("llama3-8b", (16, 64, 128)))
    for preset, batches in configs:
        if only and preset != only:
            continue
        t0 = time.time()
        qmodel = build_quantized(
            LlamaConfig(**LLAMA_PRESETS[preset]),
            nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
        fuse_for_serving(qmodel)
        to_w4a8_serving(qmodel)
        print(f"{preset} build {time.time()-t0:.0f}s", flush=True)
        for batch in batches:
            for on in (False, True):
                da.set_batched_attn(on)
                label = "flash" if on else "xla  "
                try:
                    ms, tps, cs = run(qmodel, batch)
                    print(f"{preset} B={batch:4d} {label}  "
                          f"{ms:7.2f} ms/step  {tps:7.1f} tok/s  "
                          f"(compile {cs:.0f}s)", flush=True)
                except Exception as e:
                    print(f"{preset} B={batch:4d} {label}  FAILED "
                          f"{type(e).__name__}: {e}", flush=True)
        da.set_batched_attn(True)
        del qmodel


if __name__ == "__main__":
    main()
