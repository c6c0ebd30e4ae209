from . import binning, sampling, tracer, tracer_ref

__all__ = ["binning", "sampling", "tracer", "tracer_ref"]
