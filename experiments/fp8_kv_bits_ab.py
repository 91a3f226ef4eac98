"""Round-5 (VERDICT #5): fp8-KV decode with the integer-bit e4m3->bf16
conversion (kernels/decode_attention._f8_bits_to_bf16) vs Mosaic astype.

Round-4 state: fp8-KV B=1 108.7 tok/s vs int8-KV 169.5 (36% tax, the
e4m3->bf16 VPU cast). The microbench (fp8_cast_ab.log) put the astype at
3.6 us marginal per [1024,128] K+V pair vs 1.1 us for the bit ladder —
x32 programs/layer that is most of the gap. This is the e2e A/B on the
full fused W4A8 serving path + a parity check between the two
conversion modes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.kernels import decode_attention as DA
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     to_w4a8_serving)
from decode_ab import build_decode

STEPS = 256
T = 1024


def main():
    print("device:", jax.devices(), flush=True)

    # parity first: one fused fp8 attention call, bits vs astype
    rng = np.random.default_rng(0)
    from neural_compressor_tpu.models.llama import (QuantKVCache, _kv_quant)

    B, Hkv, D, rep = 1, 8, 128, 4
    k = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hkv * rep, 1, D)), jnp.bfloat16)
    hist = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    kc, ks = _kv_quant(hist, fmt="fp8_e4m3")
    cache = QuantKVCache(kc, ks, kc, ks)
    outs = {}
    for bits in (False, True):
        DA.set_f8_via_bits(bits)
        out, _ = DA.decode_attention_quant(q, k, v, cache, 700)
        outs[bits] = np.asarray(out, np.float32)
    err = np.abs(outs[True] - outs[False]).max()
    print(f"fused fp8 attention bits-vs-astype max diff: {err:.2e} "
          f"(must be 0: the ladder is bit-exact)", flush=True)

    for preset in (sys.argv[1:] or ["llama2-7b"]):
        t0 = time.time()
        m = build_quantized(
            LlamaConfig(**LLAMA_PRESETS[preset]),
            nq.RTNConfig(dtype="int4", group_size=128,
                         quant_lm_head=True))
        fuse_for_serving(m)
        to_w4a8_serving(m)
        enable_fused_decode(m)
        print(f"{preset} build {time.time()-t0:.0f}s", flush=True)
        for label, qkv, bits in (("int8-KV      ", True, True),
                                 ("fp8-KV astype", "fp8_e4m3", False),
                                 ("fp8-KV bits  ", "fp8_e4m3", True)):
            try:
                DA.set_f8_via_bits(bits)
                st, mk, dec = build_decode(m, 1, T, quant_kv=qkv)
                tok = jnp.zeros((1, 1), jnp.int32)
                _, _, a = dec(st, mk(), tok, 4)
                _ = np.asarray(a)
                t0 = time.time()
                _, _, a = dec(st, mk(), tok, STEPS)
                _ = np.asarray(a)
                dt = (time.time() - t0) / STEPS
                print(f"{preset} {label} {dt*1e3:6.2f} ms/tok  "
                      f"{1/dt:6.1f} tok/s", flush=True)
            except Exception as e:
                print(f"{preset} {label} FAILED {type(e).__name__}: {e}",
                      flush=True)
        del m
    DA.set_f8_via_bits(True)


if __name__ == "__main__":
    main()
