"""Continuous-batching serving of a quantized model with an INT8 KV cache."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.serving import ContinuousBatchingEngine


def main():
    model = LlamaForCausalLM.from_preset("llama-test")
    qmodel = nq.quantize(
        model,
        nq.RTNConfig(dtype="int4", group_size=32) + nq.KVCacheQuantConfig())

    engine = ContinuousBatchingEngine(qmodel, n_slots=4, max_len=128)
    rng = np.random.default_rng(0)
    reqs = [engine.submit(rng.integers(0, 256, (n,)), max_new_tokens=12)
            for n in (5, 17, 9, 30, 11, 7)]
    done = engine.run()
    for r in done:
        print(f"request {r.uid}: {len(r.generated)} tokens -> {r.generated}")

    # paged mode: shared page pool + block tables — slots only own the
    # pages their length needs, so the pool can be sized well under
    # n_slots * max_len. With an int4-KV model the pool packs two tokens
    # per byte (8x bf16 token capacity) and is the fastest serving path
    # measured (PERF_NOTES "Paged KV serving").
    q4 = nq.quantize(
        LlamaForCausalLM.from_preset("llama-test"),
        nq.RTNConfig(dtype="int4", group_size=32)
        + nq.KVCacheQuantConfig(dtype="int4"))
    paged = ContinuousBatchingEngine(q4, n_slots=4, max_len=128,
                                     paged=True, page_size=16, n_pages=17)
    for n in (5, 17, 9, 30):
        paged.submit(rng.integers(0, 256, (n,)), max_new_tokens=12)
    for r in paged.run():
        print(f"paged request {r.uid}: {len(r.generated)} tokens")
    paged.print_metrics()


if __name__ == "__main__":
    main()
