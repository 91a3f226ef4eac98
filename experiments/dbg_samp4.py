import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import neural_compressor_tpu as nq
from neural_compressor_tpu.models import LlamaForCausalLM
from neural_compressor_tpu.serving.engine import ContinuousBatchingEngine
from flax import nnx

m = LlamaForCausalLM.from_preset("llama-test", dtype=jnp.float32)
qmodel = nq.quantize(m, nq.RTNConfig(dtype="int4", group_size=32))
rng = np.random.default_rng(26)
prompts = [rng.integers(0, 256, (20,)) for _ in range(3)]
p1 = prompts[1]

# replay engine decode manually at both batch sizes, capturing step logits
def run(B):
    eng = ContinuousBatchingEngine(qmodel, n_slots=B, max_len=64,
                                   prefill_chunk=16)
    r = eng.submit(p1, max_new_tokens=14, do_sample=True, temperature=0.8,
                   top_k=6, seed=101)
    eng._fill_slots(); eng._advance_prefill(); eng._advance_prefill()
    # now decode one step at a time eagerly, capturing logits
    gd, st = eng._graphdef, eng._state
    mm = nnx.merge(gd, st)
    logits_seq = []
    for step in range(6):
        toks = jnp.asarray(eng.slot_tok)
        pos = jnp.asarray(eng._decode_positions())
        lg, eng.caches = mm(toks[:, None], positions=pos[:, None],
                            caches=eng.caches, cache_pos=pos)
        logits_seq.append(np.asarray(lg[0, 0], np.float32))
        # greedy-advance row 0 with the SAME sampler the engine uses
        from neural_compressor_tpu.serving.engine import _sample_step
        samp = eng._decode_samp_args()
        nxt, keys = _sample_step(lg[:, 0], samp[0], samp[1], samp[2], samp[3], samp[4])
        eng.slot_tok[0] = int(nxt[0]); eng.slot_pos[0] += 1
        eng.slot_keys[0] = np.asarray(keys[0])
    return logits_seq

l1 = run(1)
l3 = run(3)
for i, (a, b) in enumerate(zip(l1, l3)):
    print(f"step {i}: max |logit diff| = {np.abs(a-b).max():.2e}  top2 gap B1 = {np.sort(a)[-1]-np.sort(a)[-2]:.3f}")
