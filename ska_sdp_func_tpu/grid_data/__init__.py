"""Gridding / degridding: the heart of the framework.

Mirrors the reference Python API surface
(src/ska_sdp_func/grid_data/__init__.py:1-26).
"""

from .clamp_channels import (
    clamp_channels_inline,
    clamp_channels_single,
    clamp_channels_uv,
)
from .grid_correct import grid_correct_pswf, grid_correct_w_stack
from .gridder_utils import (
    accumulate_scaled_arrays,
    count_nonzero_pixels,
    determine_w_step,
    dft,
    idft,
    image_lmn,
    image_to_flmn,
    residual,
    rms_diff,
    scale_inv_array,
    shift_subgrids,
    subgrid_add,
    subgrid_cut_out,
    sum_diff,
    uvw_bounds_all,
)
from .kernels import lm_to_n, make_kernel, make_pswf_kernel, make_w_pattern
from .wtower import GridderWtowerUVW

__all__ = [
    # lazy (PEP 562) exports resolve in __getattr__ below
    "GridderDirect",
    "GridderUvwEsFft",
    "GridderWtowerUVW",
    "calculate_params_from_epsilon",
    "degrid_uvw_custom",
    "determine_max_w_tower_height",
    "find_max_w_tower_height",
    "worst_case_image",
    "wstack_wtower_degrid_all",
    "wstack_wtower_grid_all",
    "accumulate_scaled_arrays",
    "clamp_channels_inline",
    "clamp_channels_single",
    "clamp_channels_uv",
    "count_nonzero_pixels",
    "determine_w_step",
    "dft",
    "grid_correct_pswf",
    "grid_correct_w_stack",
    "idft",
    "image_lmn",
    "image_to_flmn",
    "lm_to_n",
    "make_kernel",
    "make_pswf_kernel",
    "make_w_pattern",
    "residual",
    "rms_diff",
    "scale_inv_array",
    "shift_subgrids",
    "subgrid_add",
    "subgrid_cut_out",
    "sum_diff",
    "uvw_bounds_all",
]


def __getattr__(name):
    # Heavier gridders resolve lazily as they are added.
    lazy = {
        "GridderDirect": ".direct",
        "GridderUvwEsFft": ".es_fft",
        "calculate_params_from_epsilon": ".es_params",
        "degrid_uvw_custom": ".custom",
        "wstack_wtower_grid_all": ".wstack",
        "wstack_wtower_degrid_all": ".wstack",
        "determine_max_w_tower_height": ".wtower_height",
        "find_max_w_tower_height": ".wtower_height",
        "worst_case_image": ".wtower_height",
    }
    if name in lazy:
        import importlib

        module = importlib.import_module(lazy[name], __name__)
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
