from .inverse import (
    FitResult,
    fit_scene_parameters,
    ir_loss,
    material_ids_padded,
    render_soft_ir,
    with_material_absorption,
)

__all__ = [
    "FitResult", "fit_scene_parameters", "ir_loss", "material_ids_padded",
    "render_soft_ir", "with_material_absorption",
]
