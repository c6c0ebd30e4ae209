"""audiorenderingv2_tpu — TPU-native differentiable acoustic renderer.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
sgrazi/AudioRenderingV2 (real-time geometric-acoustics auralization:
scene -> sound-ray path tracing -> binaural impulse response -> FFT
convolution -> audio), extended with end-to-end differentiability and
multi-chip/multi-host scaling over jax.sharding meshes.
"""

__version__ = "0.1.0"

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
