"""Batched decode round 3: donated caches, B=1 attn A/B, larger batches."""
import gc, sys, time
import jax
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/experiments")
import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import decode_attention as da
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
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

    da.set_decode_attn_impl("xla")
    measure(qmodel, "int4 B=1 attn=xla", batch=1, steps=192)
    for b, qkv in ((24, True), (32, True)):
        try:
            measure(qmodel, f"int4 B={b} int8-kv attn=xla", batch=b,
                    steps=64, quant_kv=qkv)
        except Exception as e:
            print(f"B={b} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
        gc.collect()
    da.set_decode_attn_impl("kernel")
    del qmodel
    gc.collect()

    model = LlamaForCausalLM.from_preset("llama2-7b")
    for b in (2, 4):
        try:
            measure(model, f"bf16 B={b}", batch=b, steps=48)
        except Exception as e:
            print(f"bf16 B={b} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
