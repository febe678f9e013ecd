from .curvilinear import CurviParams, build_curvi, curved_coords, make_curvi_ops
from .upwind import UpwindData, apply_coupled_upwind, build_upwind_data
from .elastic import (
    ElasticParams,
    Material,
    apply_stress_op,
    apply_vel_op,
    build_params,
    n_sig_for,
    voigt_map,
)

__all__ = [
    "CurviParams",
    "build_curvi",
    "curved_coords",
    "make_curvi_ops",
    "UpwindData",
    "apply_coupled_upwind",
    "build_upwind_data",
    "ElasticParams",
    "Material",
    "apply_stress_op",
    "apply_vel_op",
    "build_params",
    "n_sig_for",
    "voigt_map",
]
