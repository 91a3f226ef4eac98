import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import neural_compressor_tpu as nq
from neural_compressor_tpu.generation import greedy_search, sample
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.serving.engine import ContinuousBatchingEngine

m = LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)
qmodel = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
rng = np.random.default_rng(26)
prompts = [rng.integers(0, 256, (20,)) for _ in range(3)]
eng = ContinuousBatchingEngine(qmodel, n_slots=3, max_len=64,
                               paged=True, page_size=16, n_pages=7,
                               prefill_chunk=16)
reqs = [eng.submit(p, max_new_tokens=14) for p in prompts]
done = eng.run(chunk=4)
print("done:", len(done), "preempts:", eng.metrics()["preemptions"])
for i, (p, r) in enumerate(zip(prompts, reqs)):
    ref = np.asarray(greedy_search(qmodel, jnp.asarray(p)[None, :], max_new_tokens=14))
    print(f"req {i}: preempt={r.preemptions} match={r.generated == ref[0, len(p):].tolist()}")

# sampled variant
eng2 = ContinuousBatchingEngine(qmodel, n_slots=3, max_len=64,
                                paged=True, page_size=16, n_pages=7,
                                prefill_chunk=16)
reqs2 = [eng2.submit(p, max_new_tokens=14, do_sample=True, temperature=0.8,
                     top_k=6, seed=100 + i) for i, p in enumerate(prompts)]
done2 = eng2.run(chunk=4)
print("sampled done:", len(done2), "preempts:", eng2.metrics()["preemptions"])
for i, (p, r) in enumerate(zip(prompts, reqs2)):
    ref = np.asarray(sample(qmodel, jnp.asarray(p)[None, :], max_new_tokens=14,
                            temperature=0.8, top_k=6, seed=100 + i))[0, len(p):]
    print(f"req {i}: preempt={r.preemptions} match={np.array_equal(np.asarray(r.generated), ref)}")
