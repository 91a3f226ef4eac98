"""The engine's per-request serving surface (round 5): sampling, stop
conditions, streaming, logprobs, cancellation, preemption, and
speculative (prompt-lookup) serving — the features the reference
inherits from vLLM, owned natively here."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.serving import ContinuousBatchingEngine


def main():
    qmodel = nq.quantize(LlamaForCausalLM.from_preset("llama-test"),
                         nq.RTNConfig(dtype="int4", group_size=32))
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, (12,))

    # --- per-request sampling + streaming + logprobs ---------------------
    engine = ContinuousBatchingEngine(qmodel, n_slots=4, max_len=128)

    def stream(req, tok):
        print(f"  [stream] request {req.uid} -> token {tok}")

    greedy = engine.submit(prompt, max_new_tokens=6)
    sampled = engine.submit(prompt, max_new_tokens=6, do_sample=True,
                            temperature=0.8, top_k=40, top_p=0.95,
                            seed=7, stream=stream)
    # a sampled engine request reproduces a B=1 generation.sample() run
    # bit-for-bit (same seed); greedy requests keep the argmax programs
    engine.run()
    print("greedy :", greedy.generated)
    print("sampled:", sampled.generated)
    print("sampled logprobs:",
          [round(lp, 3) for lp in sampled.logprobs])

    # --- top-N logprobs (OpenAI-style) -----------------------------------
    tl = ContinuousBatchingEngine(qmodel, n_slots=2, max_len=128,
                                  logprobs_topk=3)
    rt = tl.submit(prompt, max_new_tokens=3, top_logprobs=3)
    tl.run()
    for tok, (vals, ids) in zip(rt.generated, rt.top_items):
        print(f"  [top_logprobs] chose {tok}; top-3 "
              f"{[(i, round(v, 2)) for i, v in zip(ids, vals)]}")

    # --- stop conditions -------------------------------------------------
    stop_tok = greedy.generated[3]
    seq = tuple(greedy.generated[2:4])
    r1 = engine.submit(prompt, max_new_tokens=12,
                       stop_token_ids=[stop_tok])     # kept in output
    r2 = engine.submit(prompt, max_new_tokens=12,
                       stop_sequences=[seq])          # trimmed
    engine.run()
    print("stop token   :", r1.generated)
    print("stop sequence:", r2.generated)

    # --- cancellation ----------------------------------------------------
    r3 = engine.submit(prompt, max_new_tokens=64)
    engine.run(max_steps=2, chunk=2)    # let it start
    engine.cancel(r3)                   # frees the slot at the next sync
    engine.run()
    print(f"cancelled after {len(r3.generated)} tokens "
          f"(cancelled={r3.cancelled})")

    # --- paged mode: admission control + preemption ----------------------
    # an undersized pool preempts the latest-arrived request (requeue +
    # exact re-prefill) instead of crashing mid-serve
    paged = ContinuousBatchingEngine(qmodel, n_slots=3, max_len=64,
                                     paged=True, page_size=16, n_pages=7,
                                     prefill_chunk=16)
    reqs = [paged.submit(rng.integers(0, 256, (20,)), max_new_tokens=14)
            for _ in range(3)]
    paged.run(chunk=4)
    print("paged done:", [len(r.generated) for r in reqs],
          "preemptions:", paged.metrics()["preemptions"])

    # --- automatic prefix caching ----------------------------------------
    # requests sharing a page-aligned prompt prefix (system prompts,
    # few-shot headers) reuse the pool pages already holding its KV —
    # the prefill runs only on the remainder
    pc = ContinuousBatchingEngine(qmodel, n_slots=2, max_len=64,
                                  paged=True, page_size=16, n_pages=16,
                                  prefill_chunk=16, prefix_cache=True)
    system = rng.integers(0, 256, (32,))     # two full pages
    a = pc.submit(np.concatenate([system, rng.integers(0, 256, (6,))]),
                  max_new_tokens=6)
    pc.run()
    b = pc.submit(np.concatenate([system, rng.integers(0, 256, (6,))]),
                  max_new_tokens=6)
    pc.run()
    m = pc.metrics()
    print(f"prefix caching: request {b.uid} reused "
          f"{m['prefix_hit_tokens']} prompt tokens from the cache "
          f"({m['prefix_cached_pages']} pages registered)")

    # --- n completions per prompt ----------------------------------------
    nc = ContinuousBatchingEngine(qmodel, n_slots=2, max_len=128)
    sibs = nc.submit_n(prompt, 3, max_new_tokens=5, temperature=0.9,
                       seed=11)
    nc.run()
    print("n=3 completions:", [r.generated for r in sibs])

    # --- speculative (prompt-lookup) serving -----------------------------
    # draft-free: each decode round verifies spec_k proposed tokens per
    # slot from that slot's own n-gram history — 6.2x measured on
    # repetitive workloads at 7B. Greedy requests verify by argmax
    # match; sampled requests by exact rejection sampling
    spec = ContinuousBatchingEngine(qmodel, n_slots=4, max_len=128,
                                    speculative="ngram", spec_k=8)
    # a repetitive-regime prompt (real workloads get this structure from
    # copy-heavy prompts; a cycling pair makes the tiny model cooperate)
    rep_prompt = np.tile([7, 191], 20).astype(np.int32)
    r = spec.submit(rep_prompt, max_new_tokens=24)
    spec.run(chunk=4)
    m = spec.metrics()
    print(f"speculative: {len(r.generated)} tokens in "
          f"{m['spec_rounds']} rounds "
          f"({m['spec_accepted'] / max(m['spec_rounds'], 1):.2f} "
          f"tokens/round)")


if __name__ == "__main__":
    main()
