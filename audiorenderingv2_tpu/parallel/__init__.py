from .sharding import (
    RAYS_AXIS,
    init_distributed,
    make_ray_mesh,
    render_ir_sharded,
    trace_directions_sharded,
)

__all__ = [
    "RAYS_AXIS", "init_distributed", "make_ray_mesh",
    "render_ir_sharded", "trace_directions_sharded",
]
