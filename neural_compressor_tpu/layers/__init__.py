"""Quantized NNX modules and calibration observers.

TPU-native replacement for the reference's quantized module types
(``INCWeightOnlyLinear`` — neural_compressor/torch/algorithms/weight_only/
modules.py:157-628, ``Patched*`` FP8 modules — fp8_quant/_quant_common/
helper_modules.py, Keras ``QStatic*`` mixins — jax/quantization/
layers_static.py): instead of class-swapping/monkey-patching, quantized
layers are first-class ``nnx.Module`` types swapped in by the convert pass.
"""

from .observers import (
    ObserverStat,
    MinMaxObserver,
    MaxAbsObserver,
    MaxAbsPerChannelObserver,
    ObservedLinear,
    make_observer,
)
from .woq_linear import WOQLinear, QDQLinear, W4A8Linear
from .qlinear import DynamicQuantLinear, StaticQuantLinear, FP8Linear, HalfPrecisionLinear
from .module_utils import named_modules, get_model_info, replace_module, module_type_name

__all__ = [
    "ObserverStat", "MinMaxObserver", "MaxAbsObserver",
    "MaxAbsPerChannelObserver", "ObservedLinear", "make_observer",
    "WOQLinear", "QDQLinear", "W4A8Linear", "DynamicQuantLinear", "StaticQuantLinear",
    "FP8Linear", "HalfPrecisionLinear",
    "named_modules", "get_model_info", "replace_module", "module_type_name",
]
