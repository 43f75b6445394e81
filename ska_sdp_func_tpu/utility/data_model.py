"""Canonical SKA data-model validation.

Reference: utility/sdp_data_model_checks.{h,c} validates canonical array
layouts — uvw ``[time, baseline, 3]``, visibilities
``[time, baseline, chan, pol]``, weights matching vis — and exposes
metadata getters (sdp_data_model_checks.h:38-304). Here the checks raise
:class:`SdpShapeError` / :class:`SdpDataTypeError` at trace time.

These helpers accept jax or numpy arrays (anything with shape/dtype).
"""

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from .errors import SdpDataTypeError, SdpShapeError


def _is_floating(dtype) -> bool:
    return jnp.issubdtype(dtype, jnp.floating)


def _is_complex(dtype) -> bool:
    return jnp.issubdtype(dtype, jnp.complexfloating)


def check_uvw(uvw, expected_num_times: Optional[int] = None,
              expected_num_baselines: Optional[int] = None) -> None:
    """Validate uvw coordinates shaped ``[num_times, num_baselines, 3]``."""
    if uvw.ndim != 3:
        raise SdpShapeError(
            f"uvw must be 3D [time, baseline, 3]; got {uvw.ndim}D"
        )
    if uvw.shape[-1] != 3:
        raise SdpShapeError(
            f"last uvw dimension must be 3; got {uvw.shape[-1]}"
        )
    if not _is_floating(uvw.dtype):
        raise SdpDataTypeError(f"uvw must be real floating; got {uvw.dtype}")
    if expected_num_times is not None and uvw.shape[0] != expected_num_times:
        raise SdpShapeError(
            f"uvw num_times {uvw.shape[0]} != expected {expected_num_times}"
        )
    if (expected_num_baselines is not None
            and uvw.shape[1] != expected_num_baselines):
        raise SdpShapeError(
            f"uvw num_baselines {uvw.shape[1]} != "
            f"expected {expected_num_baselines}"
        )


def check_vis(vis) -> None:
    """Validate visibilities shaped ``[time, baseline, chan, pol]``."""
    if vis.ndim != 4:
        raise SdpShapeError(
            f"vis must be 4D [time, baseline, chan, pol]; got {vis.ndim}D"
        )
    if not _is_complex(vis.dtype):
        raise SdpDataTypeError(f"vis must be complex; got {vis.dtype}")
    num_pols = vis.shape[3]
    if num_pols not in (1, 2, 4):
        raise SdpShapeError(f"num_pols must be 1, 2 or 4; got {num_pols}")


def check_weights(weights, vis=None) -> None:
    """Validate weights; if ``vis`` given, shapes must match."""
    if weights.ndim != 4:
        raise SdpShapeError(
            f"weights must be 4D [time, baseline, chan, pol]; "
            f"got {weights.ndim}D"
        )
    if not _is_floating(weights.dtype):
        raise SdpDataTypeError(
            f"weights must be real floating; got {weights.dtype}"
        )
    if vis is not None and tuple(weights.shape) != tuple(vis.shape):
        raise SdpShapeError(
            f"weights shape {tuple(weights.shape)} != "
            f"vis shape {tuple(vis.shape)}"
        )


class UvwMetadata(NamedTuple):
    num_times: int
    num_baselines: int


class VisMetadata(NamedTuple):
    num_times: int
    num_baselines: int
    num_channels: int
    num_pols: int


def get_uvw_metadata(uvw) -> UvwMetadata:
    check_uvw(uvw)
    return UvwMetadata(int(uvw.shape[0]), int(uvw.shape[1]))


def get_vis_metadata(vis) -> VisMetadata:
    check_vis(vis)
    return VisMetadata(*(int(s) for s in vis.shape))
