from .quantize import quantize_model

# register the save-able quantized wrapper with Keras's serialization
# registry so keras.models.load_model resolves it without extra imports
try:
    from . import qlayers as _qlayers

    _qlayers.register()
except ImportError:  # keras not installed — WOQ/static APIs unusable anyway
    pass

__all__ = ["quantize_model"]
