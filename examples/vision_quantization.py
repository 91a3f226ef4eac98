"""Quantize a vision model (ViT): Conv patch-embed + MHA projections +
MLP Linears, with RTN weight-only or calibrated static W8A8.

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/vision_quantization.py
"""
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import neural_compressor_tpu as nq
from neural_compressor_tpu.layers.module_utils import get_model_info
from neural_compressor_tpu.models import ViTForImageClassification

model = ViTForImageClassification.from_preset("vit-test")
images = jnp.asarray(
    np.random.default_rng(0).standard_normal((8, 16, 16, 3)), jnp.float32)
ref = model(images)

print("quantizable ops:",
      get_model_info(model, nq.RTNConfig.supported_op_types())[:6], "...")

# --- weight-only int8: Conv + LinearGeneral (MHA) + Linear all convert ----
qmodel = nq.quantize(ViTForImageClassification.from_preset("vit-test"),
                     nq.RTNConfig(bits=8, group_size=32))
out = qmodel(images)
rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
print(f"RTN int8: rel err vs fp {rel:.4f}")

# --- calibrated static W8A8 (Conv runs int8xint8 on the MXU) --------------
qstatic = nq.quantize(ViTForImageClassification.from_preset("vit-test"),
                      nq.INT8StaticQuantConfig(act_algo="percentile"),
                      run_fn=lambda m: m(images))
out2 = qstatic(images)
rel2 = float(jnp.linalg.norm(out2 - ref) / jnp.linalg.norm(ref))
print(f"static W8A8: rel err vs fp {rel2:.4f}")

# --- save / load ----------------------------------------------------------
import tempfile

from neural_compressor_tpu.quantization import save_load

with tempfile.TemporaryDirectory() as d:
    save_load.save(qmodel, d)
    fresh = ViTForImageClassification.from_preset("vit-test")
    loaded = save_load.load(d, fresh)
    assert jnp.allclose(loaded(images), out, atol=1e-6)
    print("save/load round-trip OK")
