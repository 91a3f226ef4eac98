from .quantize import quantize_model

__all__ = ["quantize_model"]
