from . import convolve

__all__ = ["convolve"]
