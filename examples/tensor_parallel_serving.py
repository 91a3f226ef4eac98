"""TP-sharded quantized serving over a device mesh.

On a real multi-chip slice the same code shards over ICI; here it runs on
whatever jax.devices() provides (use XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for a virtual 8-device mesh).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models import (
    LlamaForCausalLM,
    make_mesh,
    shard_model,
)
from neural_compressor_tpu.models.llama import init_kv_cache
from neural_compressor_tpu.models.sharding import enable_tp_serving


def main():
    n = len(jax.devices())
    mesh = make_mesh((1, n))
    model = LlamaForCausalLM.from_preset("llama-test")
    qmodel = nq.quantize(model, nq.RTNConfig(dtype="int4", group_size=32))
    qmodel = shard_model(qmodel, mesh)
    # run the FUSED pallas kernels per shard (shard_map + psum over ICI)
    n_tp = enable_tp_serving(qmodel, mesh)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
    with mesh:
        logits = qmodel(ids)
        caches = init_kv_cache(qmodel.cfg, 2, 32)
        _, caches = qmodel(ids, caches=caches, cache_pos=0)
        step, _ = qmodel(ids[:, :1], positions=jnp.full((2, 1), 16),
                         caches=caches, cache_pos=16)
    print(f"TP forward over {n} devices ({n_tp} fused TP ops):",
          logits.shape, "decode:", step.shape)

    # upgrade to the W4A8 serving modules (int8-MXU kernels per shard) —
    # enable_tp_serving first, so TP modules keep the tpu_strided layout
    from neural_compressor_tpu.quantization.fuse import to_w4a8_serving

    to_w4a8_serving(qmodel)
    with mesh:
        w4_logits = qmodel(ids)
    drift = float(jnp.max(jnp.abs(w4_logits - logits)))
    print(f"W4A8 TP forward: {w4_logits.shape}, "
          f"max drift vs WOQ TP {drift:.4f} (int8-act quantization)")


if __name__ == "__main__":
    main()
