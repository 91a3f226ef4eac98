"""Round-4: bh_tile sweep for the batched flash-decode kernel at large
batch (llama3-8b loses to XLA by 3-7% at B=64/128 with bh_tile=8 —
bigger bh tiles mean bigger DMAs and fewer programs).
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


def run(model, batch):
    state, make_caches, decode = build_decode(model, batch, 1024,
                                              quant_kv=True)
    tok = jnp.zeros((batch, 1), jnp.int32)
    _, _, acc = decode(state, make_caches(), tok, 4)
    _ = np.asarray(acc)
    t0 = time.time()
    _, _, acc = decode(state, make_caches(), tok, STEPS)
    _ = np.asarray(acc)
    dt = time.time() - t0
    return dt / STEPS * 1e3, batch * STEPS / dt


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    qmodel = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama3-8b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(qmodel)
    to_w4a8_serving(qmodel)
    print(f"build {time.time()-t0:.0f}s", flush=True)

    for batch in (64, 128):
        for bh_tile, cap in ((8, 2), (16, 4), (32, 8), (64, 8)):
            da.set_batched_tiles(bh_tile, cap)
            try:
                ms, tps = run(qmodel, batch)
                print(f"B={batch} bh_tile={bh_tile:3d} cap={cap}MB  "
                      f"{ms:7.2f} ms/step  {tps:7.1f} tok/s", flush=True)
            except Exception as e:
                print(f"B={batch} bh_tile={bh_tile} FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        da.set_batched_tiles(None)


if __name__ == "__main__":
    main()
