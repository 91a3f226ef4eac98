"""QuaRot + hybrid W4A8: rotate the residual stream to flatten outliers,
then GPTQ-int4 weights served with int8 activations."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.algorithms.calib_capture import calibration_forward
from neural_compressor_tpu.algorithms.quarot import apply_quarot
from neural_compressor_tpu.models import LlamaForCausalLM


def main():
    model = LlamaForCausalLM.from_preset("llama-test")
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (2, 16)))
    y_fp = model(ids)

    apply_quarot(model, seed=0)          # fp-equivalent rotation
    calib = [jnp.asarray(rng.integers(0, 256, (4, 32))) for _ in range(8)]
    qmodel = nq.quantize(
        model, nq.HybridGPTQConfig(dtype="int4", group_size=32,
                                   block_size=64),
        run_fn=lambda m: calibration_forward(m, calib))
    y_q = qmodel(ids)
    rel = float(jnp.linalg.norm((y_fp - y_q).astype(jnp.float32))
                / jnp.linalg.norm(y_fp.astype(jnp.float32)))
    print(f"QuaRot + W4A8 output rel err vs fp: {rel:.4f}")


if __name__ == "__main__":
    main()
