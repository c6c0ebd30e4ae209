from . import obj, wav

__all__ = ["obj", "wav"]
