"""Channel-range clamping: the visibility-selection primitive.

Restricts per-row channel ranges so that scaled u/v/w coordinates fall
inside a box — used for subgrid and w-slab binning by every gridder driver.

Reference: grid_data/sdp_gridder_clamp_channels.{h,cpp,cu}; the scalar
kernel is `sdp_gridder_clamp_channels_inline`
(sdp_gridder_clamp_channels.h:116-172). This module is the fully
vectorised, jittable equivalent: one fused elementwise pass over all rows,
instead of a scalar loop.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..utility.constants import C_0
from ..utility.errors import SdpInvalidArgumentError, SdpShapeError

Array = jax.Array

_INT_GUARD = 2147483645.0


def _clamp_1d(u, freq0_hz, dfreq_hz, start_ch, end_ch, min_u, max_u):
    """Vectorised core: clamp (start_ch, end_ch) so min_u <= ch*du+u0 < max_u.

    Follows sdp_gridder_clamp_channels_inline exactly, including the
    overflow guard `eta` and the empty-range normalisation to (0, 0).
    All of u, start_ch, end_ch may be arrays; min_u/max_u may be scalars
    or arrays broadcastable against u.
    """
    compute_dtype = jnp.result_type(u, jnp.float32)
    u = jnp.asarray(u, compute_dtype)
    u0 = freq0_hz * u / C_0
    du = dfreq_hz * u / C_0
    min_u = jnp.asarray(min_u, compute_dtype)
    max_u = jnp.asarray(max_u, compute_dtype)

    eta = jnp.maximum(jnp.abs(min_u - u0), jnp.abs(max_u - u0)) / _INT_GUARD

    # Safe divisor to avoid inf/nan in the unused branches.
    safe_du = jnp.where(jnp.abs(du) > eta, du, jnp.ones_like(du))
    lo = jnp.ceil((min_u - u0) / safe_du)
    hi = jnp.ceil((max_u - u0) / safe_du)

    start_dtype = jnp.asarray(start_ch).dtype
    int_min = jnp.iinfo(start_dtype).min
    int_max = jnp.iinfo(start_dtype).max
    lo_i = jnp.clip(lo, int_min, int_max).astype(start_dtype)
    hi_i = jnp.clip(hi, int_min, int_max).astype(start_dtype)

    pos = du > eta
    neg = du < -eta
    new_start = jnp.where(
        pos, jnp.maximum(start_ch, lo_i),
        jnp.where(neg, jnp.maximum(start_ch, hi_i), start_ch))
    new_end = jnp.where(
        pos, jnp.minimum(end_ch, hi_i),
        jnp.where(neg, jnp.minimum(end_ch, lo_i), end_ch))

    # du ~ 0: binary in/out decision on u0.
    outside = jnp.logical_and(
        jnp.logical_not(pos), jnp.logical_not(neg))
    outside = jnp.logical_and(
        outside, jnp.logical_or(min_u > u0, max_u <= u0))
    new_start = jnp.where(outside, jnp.zeros_like(new_start), new_start)
    new_end = jnp.where(outside, jnp.zeros_like(new_end), new_end)

    # Normalise empty ranges to (0, 0).
    empty = new_end <= new_start
    new_start = jnp.where(empty, jnp.zeros_like(new_start), new_start)
    new_end = jnp.where(empty, jnp.zeros_like(new_end), new_end)
    return new_start, new_end


@partial(jax.jit, static_argnames=("dim",))
def clamp_channels_single(uvws: Array, dim: int, freq0_hz, dfreq_hz,
                          start_chs: Array, end_chs: Array,
                          min_u, max_u):
    """Clamp channel ranges on one uvw dimension.

    Equivalent of `sdp_gridder_clamp_channels_single`
    (sdp_gridder_clamp_channels.h:42-56), returning new
    ``(start_chs, end_chs)`` instead of writing in place.

    :param uvws: ``float[uvw_count, 3]`` coordinates in metres.
    :param dim: dimension (0, 1 or 2) to check.
    :param min_u: inclusive lower bound (scaled units, i.e. wavelengths).
    :param max_u: exclusive upper bound.
    """
    uvws = jnp.asarray(uvws)
    if uvws.ndim != 2 or uvws.shape[-1] != 3:
        raise SdpShapeError(
            f"clamp_channels_single: uvws must be [n, 3]; got "
            f"{uvws.shape}")
    if dim not in (0, 1, 2):
        raise SdpInvalidArgumentError(
            f"clamp_channels_single: dim must be 0, 1 or 2; got {dim}")
    return _clamp_1d(uvws[:, dim], freq0_hz, dfreq_hz,
                     start_chs, end_chs, min_u, max_u)


@jax.jit
def clamp_channels_uv(uvws: Array, freq0_hz, dfreq_hz,
                      start_chs: Array, end_chs: Array,
                      min_u, max_u, min_v, max_v):
    """Clamp channel ranges to a (u, v) box.

    Equivalent of `sdp_gridder_clamp_channels_uv`
    (sdp_gridder_clamp_channels.h:79-94).
    """
    uvws = jnp.asarray(uvws)
    if uvws.ndim != 2 or uvws.shape[-1] != 3:
        raise SdpShapeError(
            f"clamp_channels_uv: uvws must be [n, 3]; got {uvws.shape}")
    start_chs, end_chs = _clamp_1d(
        uvws[:, 0], freq0_hz, dfreq_hz, start_chs, end_chs, min_u, max_u)
    start_chs, end_chs = _clamp_1d(
        uvws[:, 1], freq0_hz, dfreq_hz, start_chs, end_chs, min_v, max_v)
    return start_chs, end_chs


def clamp_channels_inline(u, freq0_hz, dfreq_hz, start_ch, end_ch,
                          min_u, max_u):
    """Scalar/broadcast variant (`sdp_gridder_clamp_channels_inline`)."""
    return _clamp_1d(u, freq0_hz, dfreq_hz, start_ch, end_ch, min_u, max_u)
