from .checkpoint import (
    load_checkpoint,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)
from .io_vtk import PVDWriter, write_vtu
from .profiling import RegionTimer, device_trace, write_run_report

__all__ = [
    "load_checkpoint",
    "load_checkpoint_orbax",
    "save_checkpoint",
    "save_checkpoint_orbax",
    "PVDWriter",
    "write_vtu",
    "RegionTimer",
    "device_trace",
    "write_run_report",
]
