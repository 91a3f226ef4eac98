"""Round-4: long-context prefill through the chunked-attention path.

llama2-7b W4A8 cacheless forward at S in {4k, 8k, 16k}. The dense mask
+ scores at 16k would need ~33 GB (32 heads x 16k^2 f32) — impossible
on the 16 GB chip; the _ChunkedCausal path holds one 67 MB block.
Throughput = prefill tokens/s (matmul-bound; attention grows O(S^2)).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (fuse_for_serving,
                                                     to_w4a8_serving)


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    m = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(m)
    to_w4a8_serving(m)
    print(f"build {time.time()-t0:.0f}s", flush=True)

    from flax import nnx

    from neural_compressor_tpu.quantization.fuse import s4_prepare

    graphdef, state = nnx.split(m)

    @jax.jit
    def prefill_logit(state, ids):
        mm = nnx.merge(graphdef, state)
        s4_prepare(mm)
        logits = mm(ids)
        return logits[0, -1].astype(jnp.float32)  # tiny read-back

    rng = np.random.default_rng(0)
    for S in (4096, 8192, 16384):
        ids = jnp.asarray(rng.integers(0, 32000, (1, S)), jnp.int32)
        try:
            t0 = time.time()
            out = np.asarray(prefill_logit(state, ids))
            cs = time.time() - t0
            t0 = time.time()
            out = np.asarray(prefill_logit(state, ids))
            dt = time.time() - t0
            ok = np.isfinite(out).all()
            print(f"S={S:6d}  {dt*1e3:8.1f} ms  {S/dt:8.0f} tok/s "
                  f"prefill  finite={ok} (compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"S={S} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
