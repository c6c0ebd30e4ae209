"""audiorenderingv2_tpu — TPU-native differentiable acoustic renderer.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
sgrazi/AudioRenderingV2 (real-time geometric-acoustics auralization:
scene -> sound-ray path tracing -> binaural impulse response -> FFT
convolution -> audio), extended with end-to-end differentiability and
multi-chip/multi-host scaling over jax.sharding meshes.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Enable JAX's persistent compilation cache (opt-out: AR2_NO_COMPILE_CACHE).

    The trace kernels are minutes of Mosaic compile on remote-compile
    backends; the persistent cache turns every repeat process start into a
    sub-second disk hit (measured: a cold 1M-ray render program compiles in
    ~18 min through the tunnel, a cache hit loads in seconds). Safe to call
    before any JAX computation; keyed by HLO hash so stale entries are
    simply never hit.
    """
    if _os.environ.get("AR2_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already configured one
    path = _os.environ.get(
        "AR2_COMPILE_CACHE_DIR",
        _os.path.expanduser("~/.cache/audiorenderingv2_tpu/jax"))
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache setup break rendering
        pass


_enable_compile_cache()

from . import constants
from .config import Config, MaterialSpec, PathtracerParams, RendererParams, SceneParams, load_config, parse_config
from .core.tracer_ref import TraceParams
from .core.tracer import TracerOptions, SceneArrays, scene_to_arrays, trace_ir
from .scene import Scene, build_scene, load_scene

__all__ = [
    "constants",
    "Config", "MaterialSpec", "PathtracerParams", "RendererParams",
    "SceneParams", "load_config", "parse_config",
    "TraceParams", "TracerOptions", "SceneArrays", "scene_to_arrays",
    "trace_ir", "Scene", "build_scene", "load_scene",
]
