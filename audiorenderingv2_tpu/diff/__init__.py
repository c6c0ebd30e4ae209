from .inverse import (
    FitResult,
    coarse_emitter_search,
    emitter_grid,
    fit_scene_parameters,
    ir_loss,
    material_ids_padded,
    render_soft_ir,
    smooth_ir,
    with_material_absorption,
)

__all__ = [
    "FitResult", "coarse_emitter_search", "emitter_grid",
    "fit_scene_parameters", "ir_loss", "material_ids_padded",
    "render_soft_ir", "smooth_ir", "with_material_absorption",
]
