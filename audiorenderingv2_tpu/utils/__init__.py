from . import acoustics, profiling

__all__ = ["acoustics", "profiling"]
