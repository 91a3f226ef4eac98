"""Pallas TPU kernels — the native compute path of the engine.

These replace the reference's delegated native kernels (SURVEY §2.9):
``torch.ops.hpu.convert_from_uint4`` fused dequant-matmul
(neural_compressor/torch/algorithms/weight_only/modules.py:751-754) and the
HPU fp8 ops — rebuilt as MXU-tiled Pallas kernels with an XLA fallback path.
"""

from .dequant_matmul import (
    dequant_matmul_pallas,
    set_default_impl,
    vpu_matvec,
    vpu_matvec_int8act,
    woq_matmul,
)
from .decode_attention import set_cache_write_mode, set_decode_attn_impl
from .paged_attention import paged_decode_attention
from .w4a8_matmul import w4a8_matmul

__all__ = ["woq_matmul", "dequant_matmul_pallas", "set_default_impl",
           "vpu_matvec", "vpu_matvec_int8act", "w4a8_matmul",
           "set_cache_write_mode", "set_decode_attn_impl",
           "paged_decode_attention"]
