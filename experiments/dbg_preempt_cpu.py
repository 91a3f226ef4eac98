import sys, os
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import neural_compressor_tpu as nq
from neural_compressor_tpu.generation import greedy_search
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
print("preempts:", eng.metrics()["preemptions"])
for i, (p, r) in enumerate(zip(prompts, reqs)):
    ref = np.asarray(greedy_search(qmodel, jnp.asarray(p)[None, :], max_new_tokens=14))[0, len(p):]
    ok = r.generated == ref.tolist()
    print(f"req {i}: preempt={r.preemptions} match={ok}")
    if not ok:
        d = next(j for j in range(14) if r.generated[j] != ref[j])
        print(f"  diverge at {d}; got {r.generated}\n              ref {ref.tolist()}")
        # top-2 gap at the divergence point, from the reference trajectory
        ctx = np.concatenate([p, ref[:d]])
        lg = np.asarray(qmodel(jnp.asarray(ctx)[None, :]), np.float32)[0, -1]
        srt = np.sort(lg)
        print(f"  ref-path top2 gap at step {d}: {srt[-1]-srt[-2]:.6f}")
