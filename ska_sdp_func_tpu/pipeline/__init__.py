"""Major-cycle imaging solver (grid -> FFT -> CLEAN -> degrid).

The reference is a stateless kernel library; the major cycle lives in
SKA's host frameworks (SURVEY.md §0). Here it is a first-class, fully
on-device component: the solver state (model image, residual) iterates
through jitted grid/CLEAN/degrid graphs, optionally over a device mesh
(visibility rows sharded, partial grids `psum`-reduced).
"""

from .ingest import ingest_flag_and_weight, \
    ingest_flag_and_weight_sharded, ingest_to_solver, station_beam_power
from .fista import FistaResult, fista_imager
from .checkpoint import (
    SolverCheckpointer,
    load_result,
    load_state,
    save_result,
    save_state,
)
from .major_cycle import (
    ImagingResult,
    dirty_and_psf,
    major_cycle_imager,
    make_psf_plan,
)

__all__ = [
    "FistaResult",
    "ImagingResult",
    "fista_imager",
    "SolverCheckpointer",
    "dirty_and_psf",
    "ingest_flag_and_weight",
    "ingest_flag_and_weight_sharded",
    "ingest_to_solver",
    "station_beam_power",
    "load_result",
    "load_state",
    "major_cycle_imager",
    "make_psf_plan",
    "save_result",
    "save_state",
]
