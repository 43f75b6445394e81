"""Multi-scale CLEAN (Cornwell).

Reference: clean/sdp_ms_clean_cornwell.{h,cpp} — CPU only in the
reference; here the whole algorithm runs on-chip. Setup: Gaussian scale
kernels (sigma = 3/16 * scale, normalised 1/(2 pi sigma^2); delta for
scale 0; sdp_create_scale_kern, sdp_ms_clean_cornwell.cpp:112-166),
scale-convolved PSFs (each scale pair, two FFT convolutions) and residuals,
coupling matrix = max of each scaled PSF (:518-549). Minor loop: per-scale
peak, bias by the coupling diagonal, pick the overall peak, add the scale
kernel window to the component model and cross-subtract the scaled PSF from
every scale's residual (:557-704). Finish: components convolved with the
clean beam + scale-0 residual.
"""

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..numeric_functions.fft_convolution import fft_convolution
from ..utility.errors import SdpShapeError
from .hogbom import create_cbeam

Array = jax.Array


def _make_scale_kernels(scales: np.ndarray, length: int,
                        dtype) -> jnp.ndarray:
    """Gaussian scale kernels [num_scales, length, length]."""
    kerns = []
    centre = length // 2
    x = np.arange(length) - centre
    dist2 = x[:, None] ** 2 + x[None, :] ** 2
    for scale in scales:
        if scale == 0:
            kern = np.zeros((length, length))
            kern[centre, centre] = 1.0
        else:
            sigma = (3.0 / 16.0) * scale
            two_sigma_sq = 2.0 * sigma * sigma
            kern = np.exp(-dist2 / two_sigma_sq) / (np.pi * two_sigma_sq)
        kerns.append(kern)
    return jnp.asarray(np.stack(kerns), dtype)


@partial(jax.jit, static_argnames=("cycle_limit",))
def _ms_minor_cycle(scaled_residuals: Array, scaled_psfs: Array,
                    scale_kernels: Array, coupling: Array, loop_gain,
                    threshold, cycle_limit: int, scale_bias=None):
    """On-chip multi-scale minor cycle.

    scaled_residuals: [S, N, N] real; scaled_psfs: [S, S, P, P] real
    (indexed [target_scale, peak_scale]); scale_kernels: [S, P, P] real.
    ``scale_bias`` (optional [S] vector) multiplies the per-scale
    SELECTION score only (Cornwell 2008's small-scale bias: without it
    point sources over-attribute flux to large scales); the subtracted
    gain stays the unbiased coupling-corrected peak, so None reproduces
    the reference exactly (sdp_ms_clean_cornwell.cpp:569-648).
    Returns (scaled_residuals, clean_components).
    """
    num_scales, size, _ = scaled_residuals.shape
    loop_gain = jnp.asarray(loop_gain, scaled_residuals.dtype)
    threshold = jnp.asarray(threshold, scaled_residuals.dtype)
    diag = jnp.diagonal(coupling)
    if scale_bias is None:
        sel_bias = jnp.ones((num_scales,), scaled_residuals.dtype)
    else:
        sel_bias = jnp.asarray(scale_bias, scaled_residuals.dtype)

    def peaks(residuals):
        flat = residuals.reshape(num_scales, -1)
        idx = jnp.argmax(flat, axis=1)
        peak = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
        # The reference tracks peaks with a strict > against 0 init:
        # non-positive planes keep peak 0 at index 0
        # (sdp_ms_clean_cornwell.cpp:569-592).
        pos = peak > 0
        return (jnp.where(pos, peak, jnp.zeros_like(peak)),
                jnp.where(pos, idx, jnp.zeros_like(idx)))

    def cond(state):
        residuals, _, cycle = state
        peak, idx = peaks(residuals)
        max_scale = jnp.argmax((peak / diag) * sel_bias)
        unbiased = peak[max_scale]
        return jnp.logical_and(cycle < cycle_limit, unbiased >= threshold)

    def body(state):
        residuals, model, cycle = state
        peak, idx = peaks(residuals)
        biased = peak / diag
        max_scale = jnp.argmax(biased * sel_bias)
        max_biased = biased[max_scale]
        flat_idx = idx[max_scale]
        x = flat_idx // size
        y = flat_idx % size
        gain_peak = loop_gain * max_biased
        # Add the scale-kernel window to the component model
        # (window [N - x : 2N - x, N - y : 2N - y] of the P-sized kernel).
        kern = jnp.take(scale_kernels, max_scale, axis=0)
        kern_window = jax.lax.dynamic_slice(
            kern, (size - x, size - y), (size, size))
        model = model + gain_peak * kern_window
        # Cross-subtract scaled PSFs from every scale's residual.
        psf_col = jnp.take(scaled_psfs, max_scale, axis=1)  # [S, P, P]
        psf_windows = jax.lax.dynamic_slice(
            psf_col, (0, size - x, size - y), (num_scales, size, size))
        residuals = residuals - gain_peak * psf_windows
        return residuals, model, cycle + 1

    model = jnp.zeros((size, size), scaled_residuals.dtype)
    residuals, model, _ = jax.lax.while_loop(
        cond, body, (scaled_residuals, model, jnp.asarray(0, jnp.int32)))
    return residuals, model


def ms_clean_cornwell(dirty_img: Array, psf: Array, cbeam_details,
                      scale_list: Sequence[int], loop_gain: float,
                      threshold: float, cycle_limit: int
                      ) -> Tuple[Array, Array, Array]:
    """Multi-scale CLEAN; returns ``(clean_model, residual, skymodel)``.

    Equivalent of `sdp_ms_clean_cornwell` (sdp_ms_clean_cornwell.h:41-53).
    """
    dirty_img = jnp.asarray(dirty_img)
    psf = jnp.asarray(psf)
    if dirty_img.ndim != 2:
        raise SdpShapeError("dirty image must be 2D")
    size = int(dirty_img.shape[0])
    psf_dim = int(psf.shape[0])
    if psf_dim < 2 * size:
        raise SdpShapeError(
            f"psf (size {psf_dim}) must be at least twice the dirty image "
            f"size ({size})")
    scales = np.asarray(scale_list, dtype=np.int64)
    num_scales = len(scales)
    cdtype = jnp.result_type(dirty_img.dtype, jnp.complex64)

    # Scale kernels at PSF size (complex for the convolutions).
    scale_kernels = _make_scale_kernels(scales, psf_dim, dirty_img.dtype)

    # Scaled PSFs: psf (*) kern_s (*) kern_p for each scale pair.
    psf_c = psf.astype(cdtype)
    once = [fft_convolution(psf_c, scale_kernels[s].astype(cdtype))
            for s in range(num_scales)]
    scaled_psfs = jnp.stack([
        jnp.stack([fft_convolution(once[s],
                                   scale_kernels[p].astype(cdtype)).real
                   for p in range(num_scales)])
        for s in range(num_scales)]).astype(dirty_img.dtype)

    # Coupling matrix: max of each doubly-scaled PSF.
    coupling = jnp.max(scaled_psfs.reshape(num_scales, num_scales, -1),
                       axis=-1)

    # Scaled residuals: dirty (*) kern_s.
    dirty_c = dirty_img.astype(cdtype)
    scaled_residuals = jnp.stack([
        fft_convolution(dirty_c, scale_kernels[s].astype(cdtype)).real
        for s in range(num_scales)]).astype(dirty_img.dtype)

    residuals, model = _ms_minor_cycle(
        scaled_residuals, scaled_psfs, scale_kernels, coupling,
        float(loop_gain), float(threshold), int(cycle_limit))

    details = np.asarray(cbeam_details, dtype=np.float64)
    cbeam = create_cbeam(jnp.asarray(details, dirty_img.dtype), psf_dim)
    convolved = fft_convolution(model.astype(cdtype), cbeam)
    residual_out = residuals[0]
    skymodel = convolved.real.astype(dirty_img.dtype) + residual_out
    return model, residual_out, skymodel
