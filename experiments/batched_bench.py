"""Batched decode throughput: int4 (large batch, fits) vs bf16 (max
feasible batch) at T=1024 on one v5e chip — the capacity->throughput story.
"""
from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (
    LLAMA_PRESETS, LlamaConfig, build_quantized)
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.quantization.fuse import fuse_for_serving
from decode_ab import measure


def main():
    print(f"device: {jax.devices()}", flush=True)
    t0 = time.time()
    qmodel = build_quantized(LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
                             nq.RTNConfig(dtype="int4", group_size=128))
    fuse_for_serving(qmodel)
    print(f"int4 build {time.time()-t0:.0f}s", flush=True)

    import gc

    # bf16 KV costs 536 MB/slot at T=1024 (7B): big batches need int8-KV
    for b, qkv in ((8, False), (16, True), (32, True)):
        try:
            measure(qmodel, f"int4 B={b} {'int8' if qkv else 'bf16'}-kv",
                    batch=b, steps=128, quant_kv=qkv)
        except Exception as e:
            print(f"int4 B={b} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        gc.collect()
    del qmodel
    gc.collect()

    # bf16 baseline at its max feasible batch (T=1024, 16 GB chip)
    import gc
    model = LlamaForCausalLM.from_preset("llama2-7b")
    for b in (2, 4):
        try:
            measure(model, f"bf16 B={b}", batch=b, steps=64)
        except Exception as e:
            print(f"bf16 B={b} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        gc.collect()
    del model


if __name__ == "__main__":
    main()
