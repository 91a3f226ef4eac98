"""Pallas TPU kernels — the native compute path of the engine.

These replace the reference's delegated native kernels (SURVEY §2.9):
``torch.ops.hpu.convert_from_uint4`` fused dequant-matmul
(neural_compressor/torch/algorithms/weight_only/modules.py:751-754) and the
HPU fp8 ops — rebuilt as MXU-tiled Pallas kernels with an XLA fallback path.
"""

from .dequant_matmul import woq_matmul, dequant_matmul_pallas, set_default_impl

__all__ = ["woq_matmul", "dequant_matmul_pallas", "set_default_impl"]
