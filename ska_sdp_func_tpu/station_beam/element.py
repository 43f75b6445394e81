"""Element beams: analytic dipole and spherical-wave (HARP) patterns.

Reference: station_beam/sdp_element_dipole.{h,cpp,cu} and
sdp_element_spherical_wave_harp.{h,cpp} (whose GPU path launches an
unregistered kernel in the reference — here both run everywhere).

The reference writes into strided slots of a caller-provided array; the
JAX equivalents return the updated array (functional in-place via
``.at[].set``) to keep the stride/offset API parity.
"""

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utility.constants import C_0
from ..utility.errors import SdpDataTypeError, SdpShapeError

Array = jax.Array


def _dipole_e(kl, cos_kl, phi, sin_theta, cos_theta):
    """E_theta / E_phi of a dipole (sdp_dipole,
    sdp_element_dipole.cpp:16-41). Real-valued; returned as floats."""
    cos_phi = jnp.cos(phi)
    denom = 1.0 + cos_phi * cos_phi * (cos_theta * cos_theta - 1.0)
    safe = jnp.where(denom == 0, 1.0, denom)
    temp = (jnp.cos(kl * cos_phi * sin_theta) - cos_kl) / safe
    e_theta = jnp.where(denom == 0, 0.0, -cos_phi * cos_theta * temp)
    e_phi = jnp.where(denom == 0, 0.0, jnp.sin(phi) * temp)
    return e_theta, e_phi


def dipole_pattern(theta_rad: Array, phi_rad: Array, freq_hz: float,
                   dipole_length_m: float) -> Tuple[Array, Array]:
    """Polarised dipole response: complex (E_theta, E_phi) per point
    (sdp_dipole_pattern, sdp_element_dipole.cpp:44-66)."""
    theta = jnp.asarray(theta_rad)
    phi = jnp.asarray(phi_rad)
    kl = dipole_length_m * (math.pi * freq_hz / C_0)
    cos_kl = math.cos(kl)
    e_theta, e_phi = _dipole_e(kl, cos_kl, phi, jnp.sin(theta),
                               jnp.cos(theta))
    cdtype = jnp.result_type(theta.dtype, jnp.complex64)
    return e_theta.astype(cdtype), e_phi.astype(cdtype)


def dipole_pattern_scalar(theta_rad: Array, phi_rad: Array, freq_hz: float,
                          dipole_length_m: float) -> Array:
    """Unpolarised dipole amplitude: RMS over two crossed dipoles
    (sdp_dipole_pattern_scalar, sdp_element_dipole.cpp:69-98)."""
    theta = jnp.asarray(theta_rad)
    phi = jnp.asarray(phi_rad)
    kl = dipole_length_m * (math.pi * freq_hz / C_0)
    cos_kl = math.cos(kl)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    x_th, x_ph = _dipole_e(kl, cos_kl, phi, sin_t, cos_t)
    y_th, y_ph = _dipole_e(kl, cos_kl, phi + math.pi / 2, sin_t, cos_t)
    amp = jnp.sqrt((x_th ** 2 + x_ph ** 2 + y_th ** 2 + y_ph ** 2) / 2.0)
    cdtype = jnp.result_type(theta.dtype, jnp.complex64)
    return amp.astype(cdtype)


def dipole(theta_rad: Array, phi_rad: Array, freq_hz: float,
           dipole_length_m: float, stride_element_beam: int,
           index_offset_element_beam: int, element_beam: Array) -> Array:
    """Evaluate a dipole element beam into a strided output array.

    API-parity form of `sdp_element_beam_dipole`
    (sdp_element_dipole.h; impl :101-240): for a 4-pol output
    (stride 4) writes (E_theta, E_phi) at offsets
    ``index_offset_element_beam`` and ``+1``; for a scalar output
    (stride 1) writes the RMS amplitude. Returns the updated array.
    """
    element_beam = jnp.asarray(element_beam)
    if not jnp.issubdtype(element_beam.dtype, jnp.complexfloating):
        raise SdpDataTypeError("element_beam must be complex")
    flat = element_beam.reshape(-1)
    num_points = jnp.asarray(theta_rad).shape[0]
    pos = jnp.arange(num_points) * stride_element_beam
    if stride_element_beam == 4 or (element_beam.ndim == 2
                                    and element_beam.shape[-1] == 4):
        e_theta, e_phi = dipole_pattern(theta_rad, phi_rad, freq_hz,
                                        dipole_length_m)
        flat = flat.at[pos + index_offset_element_beam].set(
            e_theta.astype(flat.dtype))
        flat = flat.at[pos + index_offset_element_beam + 1].set(
            e_phi.astype(flat.dtype))
    else:
        amp = dipole_pattern_scalar(theta_rad, phi_rad, freq_hz,
                                    dipole_length_m)
        flat = flat.at[pos + index_offset_element_beam].set(
            amp.astype(flat.dtype))
    return flat.reshape(element_beam.shape)


def _legendre2(l: int, m: int, cos_t: Array, sin_t: Array):
    """P_l^m(cos), P/sin, dP*sin — vectorised equivalent of
    `sdp_legendre2` (math/sdp_legendre_polynomial.h:10-57); l, m static.

    Three-term recurrence: p0 = P_m^m, then ascend to P_l^m keeping
    P_{l+1}^m for the derivative formula.
    """
    p0 = jnp.ones_like(cos_t)
    if m > 0:
        fact = 1.0
        for _ in range(m):
            p0 = p0 * (-fact) * sin_t
            fact += 2.0
    p1 = cos_t * (2 * m + 1) * p0  # P_{m+1}^m
    for i in range(m + 2, l + 2):
        p0, p1 = p1, ((2 * i - 1) * cos_t * p1 - (i + m - 1) * p0) / (i - m)
    # Now p0 = P_l^m and p1 = P_{l+1}^m (for l == m the loop is empty).
    nonzero = sin_t != 0
    safe = jnp.where(nonzero, sin_t, 1.0)
    out1 = jnp.where(nonzero, p0 / safe, 0.0)
    out2 = jnp.where(
        nonzero, (cos_t * p0 * (l + 1) - p1 * (l - m + 1)) / safe, 0.0)
    return p0, out1, out2


def spherical_wave_harp(theta_rad: Array, phi_x_rad: Array,
                        phi_y_rad: Array, l_max: int, coeffs: Array,
                        index_offset_element_beam: int = 0,
                        element_beam: Array = None) -> Array:
    """Spherical-wave (HARP) element beam evaluation.

    Equivalent of `sdp_element_beam_spherical_wave_harp`
    (sdp_element_spherical_wave_harp.cpp:128-233, algorithm :29-125):
    sums TE/TM spherical harmonics up to order ``l_max`` for the X and Y
    antennas. ``coeffs`` is complex with 4 entries (te_x, tm_x, te_y,
    tm_y) per (l, m) mode, flat length ``4 * ((l_max + 1)^2 - 1)``.

    Returns ``complex[num_points, 4]`` ordered (x_phi, x_theta, y_phi,
    y_theta) — the reference's documented component reversal — written
    into ``element_beam`` at ``index_offset_element_beam`` if given.
    """
    theta = jnp.asarray(theta_rad)
    phi_x = jnp.asarray(phi_x_rad)
    phi_y = jnp.asarray(phi_y_rad)
    alpha = jnp.asarray(coeffs).reshape(-1)
    fdtype = theta.dtype
    cdtype = jnp.result_type(fdtype, jnp.complex64)

    theta = jnp.maximum(theta, 1e-5)  # divide-by-zero guard (reference :48)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    x_theta = jnp.zeros(theta.shape, cdtype)
    x_phi = jnp.zeros(theta.shape, cdtype)
    y_theta = jnp.zeros(theta.shape, cdtype)
    y_phi = jnp.zeros(theta.shape, cdtype)

    def harp_term(m_signed, a_te, a_tm, c_theta, c_phi, cos_p, sin_p,
                  pds, dpms):
        qq = jax.lax.complex(-cos_p * dpms, -sin_p * dpms).astype(cdtype)
        dd = jax.lax.complex(-sin_p * pds * m_signed,
                             cos_p * pds * m_signed).astype(cdtype)
        return c_theta + dd * a_tm + qq * a_te, c_phi + qq * a_tm - dd * a_te

    for l in range(1, l_max + 1):
        ind0 = l * l - 1 + l
        f_ = (2 * l + 1) / (4.0 * math.pi * l * (l + 1))
        for abs_m in range(l, -1, -1):
            _, pds, dpms = _legendre2(l, abs_m, cos_t, sin_t)
            if abs_m == 0:
                cos_p = jnp.full_like(sin_t, math.sqrt(f_))
                sin_p = jnp.zeros_like(sin_t)
                te_x, tm_x = alpha[4 * ind0 + 0], alpha[4 * ind0 + 1]
                te_y, tm_y = alpha[4 * ind0 + 2], alpha[4 * ind0 + 3]
                x_theta, x_phi = harp_term(0.0, te_x, tm_x, x_theta, x_phi,
                                           cos_p, sin_p, pds, dpms)
                y_theta, y_phi = harp_term(0.0, te_y, tm_y, y_theta, y_phi,
                                           cos_p, sin_p, pds, dpms)
            else:
                d_fact = math.factorial(l - abs_m)
                s_fact = math.factorial(l + abs_m)
                nf = math.sqrt(f_ * d_fact / s_fact)
                ind_m = 4 * (ind0 - abs_m)
                ind_p = 4 * (ind0 + abs_m)
                # X antenna
                p = -abs_m * phi_x
                sin_p = jnp.sin(p) * nf
                cos_p = jnp.cos(p) * nf
                x_theta, x_phi = harp_term(
                    -float(abs_m), alpha[ind_m + 0], alpha[ind_m + 1],
                    x_theta, x_phi, cos_p, sin_p, pds, dpms)
                x_theta, x_phi = harp_term(
                    float(abs_m), alpha[ind_p + 0], alpha[ind_p + 1],
                    x_theta, x_phi, cos_p, -sin_p, pds, dpms)
                # Y antenna
                p = -abs_m * phi_y
                sin_p = jnp.sin(p) * nf
                cos_p = jnp.cos(p) * nf
                y_theta, y_phi = harp_term(
                    -float(abs_m), alpha[ind_m + 2], alpha[ind_m + 3],
                    y_theta, y_phi, cos_p, sin_p, pds, dpms)
                y_theta, y_phi = harp_term(
                    float(abs_m), alpha[ind_p + 2], alpha[ind_p + 3],
                    y_theta, y_phi, cos_p, -sin_p, pds, dpms)

    # NaN propagation from phi_x (reference :51-56).
    nan_mask = jnp.isnan(phi_x)
    nan_val = jax.lax.complex(phi_x, phi_x).astype(cdtype)
    x_theta = jnp.where(nan_mask, nan_val, x_theta)
    x_phi = jnp.where(nan_mask, nan_val, x_phi)
    y_theta = jnp.where(nan_mask, nan_val, y_theta)
    y_phi = jnp.where(nan_mask, nan_val, y_phi)

    # Theta/phi components reversed on output (reference :119-124).
    pattern = jnp.stack([x_phi, x_theta, y_phi, y_theta], axis=-1)
    if element_beam is None:
        return pattern
    element_beam = jnp.asarray(element_beam)
    flat = element_beam.reshape(-1, 4)
    start = index_offset_element_beam
    flat = flat.at[start:start + pattern.shape[0]].set(
        pattern.astype(flat.dtype))
    return flat.reshape(element_beam.shape)
