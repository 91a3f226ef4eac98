"""Round-4: speculative decoding measured on the chip (VERDICT #3).

Three measurements on llama2-7b (W4A8 fused serving, the bench config):
  1. baseline greedy tok/s (B=1)
  2. the speculative cost model: t_draft (1-token step of the draft) and
     t_verify (a (k+1)-token target window) — the window should cost
     ~one decode step in the weight-bound regime
  3. end-to-end speculative tok/s with two drafts:
       a. "self-quant": int2 g128 quantization of the same weights
          (draft streams 4x fewer weight bytes than bf16, 2x less than
          the int4 target)
       b. "layer-skip": a 6-layer int4 sibling (proxy for a distilled
          draft; random weights -> acceptance is chance, so this row
          measures the mechanism's overhead at worst-case acceptance)
     with accepted-length histograms.

Plus the REAL-acceptance datapoint: the trained tiny_lm (fp target /
int4 draft) on the chip, where acceptance is a property of a real LM.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.generation import (greedy_search,
                                              speculative_greedy_search)
from neural_compressor_tpu.models.llama import (LLAMA_PRESETS, LlamaConfig,
                                                build_quantized)
from neural_compressor_tpu.quantization.fuse import (enable_fused_decode,
                                                     fuse_for_serving,
                                                     to_w4a8_serving)

MNT = 128


def timed_tps(fn, *args, reps=1, **kw):
    out = fn(*args, **kw)
    ret = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(ret)  # compile + sync
    t0 = time.time()
    for _i in range(reps):
        out = fn(*args, **kw)
        ret = out[0] if isinstance(out, tuple) else out
        _ = np.asarray(ret)
    return (time.time() - t0) / reps, out


def main():
    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    target = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(target)
    to_w4a8_serving(target)
    enable_fused_decode(target)
    print(f"target build {time.time()-t0:.0f}s", flush=True)

    prompt = jnp.zeros((1, 32), jnp.int32)

    dt, ref = timed_tps(greedy_search, target, prompt,
                        max_new_tokens=MNT, max_len=512)
    base_tps = MNT / dt
    print(f"baseline greedy: {dt/MNT*1e3:.2f} ms/tok  {base_tps:.1f} tok/s",
          flush=True)

    drafts = {}
    t0 = time.time()
    d2 = build_quantized(
        LlamaConfig(**LLAMA_PRESETS["llama2-7b"]),
        nq.RTNConfig(dtype="int2", group_size=128, quant_lm_head=True))
    fuse_for_serving(d2)
    to_w4a8_serving(d2)
    drafts["self-int2"] = d2
    print(f"int2 draft build {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    cfg6 = dict(LLAMA_PRESETS["llama2-7b"])
    cfg6["num_hidden_layers"] = 6
    d6 = build_quantized(
        LlamaConfig(**cfg6),
        nq.RTNConfig(dtype="int4", group_size=128, quant_lm_head=True))
    fuse_for_serving(d6)
    to_w4a8_serving(d6)
    enable_fused_decode(d6)
    drafts["skip-6L"] = d6
    print(f"6-layer draft build {time.time()-t0:.0f}s", flush=True)

    # cost model: draft step and (k+1)-window verify
    for name, d in drafts.items():
        dtd, _ = timed_tps(greedy_search, d, prompt, max_new_tokens=16,
                           max_len=512)
        print(f"draft {name}: {dtd/16*1e3:.2f} ms/tok", flush=True)

    for name, d in drafts.items():
        for k in (2, 4):
            dts, (out, stats) = timed_tps(
                speculative_greedy_search, target, d, prompt,
                max_new_tokens=MNT, k=k, return_stats=True)
            ok = bool(jnp.all(out == ref))
            tps = MNT / dts
            print(f"spec {name} k={k}: {tps:6.1f} tok/s ({tps/base_tps:.2f}x)"
                  f"  rounds={stats['rounds']}"
                  f"  tok/round={stats['tokens_per_round']:.2f}"
                  f"  hist={stats['accept_hist']}  exact={ok}", flush=True)

    # real-LM acceptance: the trained tiny byte model on the chip
    from neural_compressor_tpu.evaluation.train_tiny import (frozen_corpus,
                                                             load_tiny_lm)

    tl = load_tiny_lm()
    if tl is not None:
        tq = nq.quantize(load_tiny_lm(),
                         nq.RTNConfig(dtype="int4", group_size=32))
        _train, val = frozen_corpus()
        pr = jnp.asarray(val[:1, :64])
        for k in (4, 8):
            dts, (out, stats) = timed_tps(
                speculative_greedy_search, tl, tq, pr,
                max_new_tokens=128, k=k, return_stats=True)
            ref2 = greedy_search(tl, pr, max_new_tokens=128)
            ok = bool(jnp.all(out == ref2))
            print(f"tiny_lm spec k={k}: rounds={stats['rounds']} "
                  f"tok/round={stats['tokens_per_round']:.2f} "
                  f"hist={stats['accept_hist']} exact={ok}", flush=True)


if __name__ == "__main__":
    main()
