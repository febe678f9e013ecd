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
