"""Serve the streaming-GPTQ'd llama2-7b checkpoint on one 16 GB chip.

End-to-end proof of the >RAM pipeline: 13.5 GB source was stream-quantized
to /root/ckpt_7b_gptq (3.7 GB, experiments/streaming_gptq_7b.py); here the
result is STREAM-LOADED (one fp layer transient, never the 13.5 GB
skeleton), fused + W4A8-converted, and decode throughput is measured.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from neural_compressor_tpu.quantization.layer_wise import (
    load_quantized_checkpoint)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)

CKPT = "/root/ckpt_7b_gptq"


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    model = load_quantized_checkpoint(CKPT)
    print(f"stream-load {time.time()-t0:.0f}s", flush=True)
    nf = fuse_for_serving(model)
    nw = to_w4a8_serving(model)
    print(f"fused {nf} groups, {nw} W4A8 modules", flush=True)

    sys.path.insert(0, "/root/repo")
    import bench

    tok_s = bench.measure_decode(model, batch=1, max_len=1024, steps=256,
                                 label="streamed-7b int4")
    print(f"SERVE-STREAMED-7B: {tok_s:.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
