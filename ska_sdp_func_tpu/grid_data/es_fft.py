"""ES-FFT gridder ("nifty"/ducc0-style, exponential-of-semicircle kernel).

Reference: grid_data/sdp_gridder_uvw_es_fft.{h,cpp}, _utils.cpp,
_kernels.cu — GPU-ONLY in the reference (the plan unconditionally
allocates on GPU, sdp_gridder_uvw_es_fft.cpp:490-513); this implementation
runs everywhere.

Algorithm (kernels at sdp_gridder_uvw_es_fft_kernels.cu):
- gridding (`sdp_cuda_nifty_gridder_gridding_3d`, :127): per (row, chan),
  flip uvw so w >= 0 (conjugating the visibility), scatter
  ``weight * vis * es(u) es(v) es(w)`` onto a w-plane uv grid with the
  fft-shift checkerboard; per plane: unnormalised inverse FFT, then
  accumulate ``Re(layer * exp(-2 pi i w (n-1)) / n)`` into the dirty image
  (`apply_w_screen_and_sum`, :430); finally divide by the separable
  Gauss-Legendre convolution correction (`conv_corr_and_scaling`, :691).
- degridding mirrors it (`reverse_w_screen_to_stack`, :555; forward FFT;
  tap gathers), conv-correcting the image first.
- es kernel: ``exp(beta (sqrt(1 - x^2) - 1))``, |x| <= 1; correction
  C(k) = support * sum_i kern_i w_i cos(pi k support x_i) over the
  positive Gauss-Legendre nodes of order 2p, p = int(1.5 support + 2)
  (sdp_generate_gauss_legendre_conv_kernel, _utils.cpp:122-175).

Kernel-parameter selection: the reference picks (support, oversampling,
beta) from a 244-entry tuned database spanning sigma 1.15..2.5
(_utils.cpp:225-537) — the grid-memory-vs-support trade. Here the same
(support, sigma, beta) space is searched with analytically tuned
parameters (es_params.py: aliasing-error quadrature + per-point beta
optimisation); ``sigma=None`` minimises the padded grid size like the
reference, a numeric ``sigma`` pins the oversampling factor.
"""

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fourier_transforms.fft import (
    fft_shifted,
    ifft_shifted,
    padded_fft_size,
)
from ..utility.constants import C_0
from ..utility.errors import SdpInvalidArgumentError

Array = jax.Array


def _es_kernel(beta, x):
    """exp(beta (sqrt(1-x^2) - 1)) for |x| <= 1, else 0."""
    inside = jnp.abs(x) <= 1.0
    safe = jnp.where(inside, x, 0.0)
    return jnp.where(inside, jnp.exp(beta * (jnp.sqrt(1.0 - safe * safe)
                                             - 1.0)), 0.0)


def _params_from_epsilon(epsilon: float, image_size: int,
                         single_precision: bool,
                         sigma: Optional[float] = None,
                         ) -> Tuple[int, int, float, float]:
    """(grid_size, support, beta, sigma_eff); see es_params.py."""
    from .es_params import calculate_params_from_epsilon

    return calculate_params_from_epsilon(
        epsilon, image_size, single_precision, sigma=sigma)


class GridderUvwEsFft:
    """Plan for the ES-FFT (de)gridder
    (`sdp_gridder_uvw_es_fft_create_plan`, sdp_gridder_uvw_es_fft.h:42-55).

    Template arrays fix shapes/dtypes; ``min_abs_w``/``max_abs_w`` come
    from :meth:`get_w_range`.
    """

    def __init__(self, uvw: Array, freq_hz: Array, vis: Array,
                 weight: Array, dirty_image: Array, pixsize_x_rad: float,
                 pixsize_y_rad: float, epsilon: float, min_abs_w: float,
                 max_abs_w: float, do_wstacking: bool,
                 sigma: Optional[float] = None):
        if pixsize_x_rad != pixsize_y_rad:
            raise SdpInvalidArgumentError(
                "Only square images supported (pixsize_x_rad must equal "
                "pixsize_y_rad)")
        self.pixsize_x_rad = float(pixsize_x_rad)
        self.pixsize_y_rad = float(pixsize_y_rad)
        self.pixel_size = float(pixsize_x_rad)
        self.epsilon = float(epsilon)
        self.do_wstacking = bool(do_wstacking)
        self.num_rows = int(vis.shape[0])
        self.num_chan = int(vis.shape[1])
        self.image_size = int(dirty_image.shape[0])
        # Dtype probe without touching device memory (plan construction
        # must not trigger transfers on tunnelled attachments).
        single = np.dtype(getattr(vis, "dtype", np.complex128)) \
            == np.complex64

        grid_size, support, beta, sigma_eff = _params_from_epsilon(
            self.epsilon, self.image_size, single, sigma=sigma)
        self.grid_size = grid_size
        self.support = support
        self.beta = beta
        self.sigma = sigma_eff
        self.uv_scale = self.grid_size * self.pixel_size

        if self.do_wstacking:
            # W-plane count and spacing (reference :345-373).
            x0 = -0.5 * self.image_size * self.pixel_size
            y0 = x0
            arg = 1.0 - x0 * x0 - y0 * y0
            nmin = math.sqrt(max(arg, 0.0)) - 1.0
            if x0 * x0 + y0 * y0 > 1.0:
                nmin = -math.sqrt(abs(arg)) - 1.0
            w_scale = 0.25 / abs(nmin)
            num_total_w_grids = int((max_abs_w - min_abs_w) / w_scale + 2)
            w_scale = 1.0 / ((1.0 + 1e-13) * (max_abs_w - min_abs_w)
                             / (num_total_w_grids - 1))
            self.min_plane_w = min_abs_w - (0.5 * support - 1.0) / w_scale
            self.max_plane_w = max_abs_w + (0.5 * support - 1.0) / w_scale
            self.num_total_w_grids = num_total_w_grids + support - 2
            self.w_scale = w_scale
            self.inv_w_range = self.max_plane_w - self.min_plane_w
        else:
            self.min_plane_w = self.max_plane_w = 0.0
            self.num_total_w_grids = 1
            self.w_scale = 1.0
            self.inv_w_range = 1.0
        self.min_abs_w = float(min_abs_w)
        self.max_abs_w = float(max_abs_w)
        self.inv_w_scale = 1.0 / self.w_scale

        # Gauss-Legendre quadrature for the convolution correction.
        p = int(1.5 * support + 2.0)
        nodes, weights = np.polynomial.legendre.leggauss(2 * p)
        pos = nodes > 0
        self._quad_nodes = nodes[pos]
        self._quad_weights = weights[pos]
        self._quad_kernel = np.exp(
            beta * (np.sqrt(1.0 - self._quad_nodes ** 2) - 1.0))
        self.conv_corr_norm_factor = float(
            support * np.sum(self._quad_kernel * self._quad_weights))
        # Precalculated half-kernel for (l, m): C(l)/norm.
        l_norm = np.arange(self.image_size // 2 + 1) / self.grid_size
        self.conv_corr_kernel = self._conv_corr(l_norm) \
            / self.conv_corr_norm_factor

        # Packed (bucket-sorted Pallas) execution plan — the TPU perf
        # path (es_fft_packed.py). Built from the plan's own uvw/freq
        # (the reference plan is likewise bound to its arrays); falls
        # back to the pure-XLA oracle path when unavailable.
        self._packed = None
        if single:
            try:
                from ..utility.device import to_host
                from .es_fft_packed import build_es_packed_plan

                self._packed = build_es_packed_plan(
                    self, to_host(uvw, np.float64),
                    to_host(freq_hz, np.float64))
            except Exception as exc:  # pragma: no cover - fallback only
                from ..utility.logging import log_warning

                log_warning(
                    "ES-FFT packed plan unavailable (%s); using the "
                    "XLA oracle path", exc)
                self._packed = None

    def _conv_corr(self, k):
        """C(k) = support * sum_i kern_i w_i cos(pi k support x_i)."""
        k = np.asarray(k, np.float64)
        phases = np.pi * k[..., None] * self.support * self._quad_nodes
        return self.support * np.sum(
            self._quad_kernel * self._quad_weights * np.cos(phases),
            axis=-1)

    @staticmethod
    def get_w_range(uvw, freq_hz) -> Tuple[float, float]:
        """(min, max) |w| in wavelengths (reference Python helper,
        gridder_uvw_es_fft.py:91-106)."""
        w = np.abs(np.asarray(uvw)[:, 2])
        freq = np.asarray(freq_hz)
        return (float(w.min() * freq[0] / C_0),
                float(w.max() * freq[-1] / C_0))

    # -- geometry shared by grid/degrid --------------------------------------
    def _taps(self, uvw, freq_hz):
        fdtype = uvw.dtype
        support = self.support
        half_support = support / 2.0
        flip = jnp.where(uvw[:, 2] < 0, -1.0, 1.0).astype(fdtype) \
            if self.do_wstacking else jnp.ones((uvw.shape[0],), fdtype)
        inv_wave = flip[:, None] * freq_hz[None, :] / C_0       # [R, C]
        pos_u = uvw[:, 0:1] * inv_wave * self.uv_scale
        pos_v = uvw[:, 1:2] * inv_wave * self.uv_scale
        if self.do_wstacking:
            pos_w = (uvw[:, 2:3] * inv_wave - self.min_plane_w) \
                * self.w_scale
        else:
            pos_w = jnp.zeros_like(pos_u)
        u0 = jnp.ceil(pos_u - half_support).astype(jnp.int32)
        v0 = jnp.ceil(pos_v - half_support).astype(jnp.int32)
        k = jnp.arange(support)
        ku = _es_kernel(self.beta,
                        ((u0[..., None] + k) - pos_u[..., None])
                        / half_support)                          # [R,C,S]
        kv = _es_kernel(self.beta,
                        ((v0[..., None] + k) - pos_v[..., None])
                        / half_support)
        iu = u0[..., None] + k + self.grid_size // 2             # [R,C,S]
        iv = v0[..., None] + k + self.grid_size // 2
        ok = ((iu >= 0) & (iu < self.grid_size))
        iu = jnp.clip(iu, 0, self.grid_size - 1)
        okv = ((iv >= 0) & (iv < self.grid_size))
        iv = jnp.clip(iv, 0, self.grid_size - 1)
        ku = jnp.where(ok, ku, 0.0)
        kv = jnp.where(okv, kv, 0.0)
        return flip, pos_w, iu, iv, ku, kv

    def _image_screens(self, plane_w, sign: float):
        """exp(sign 2 pi i w (n-1)) / n over image pixels."""
        size = self.image_size
        l = (jnp.arange(size) - size // 2) * self.pixel_size
        ll, mm = jnp.meshgrid(l, l, indexing="ij")
        sos = ll * ll + mm * mm
        nm1 = (-sos) / (jnp.sqrt(1.0 - sos) + 1.0)
        xn = 1.0 / (nm1 + 1.0)
        if not self.do_wstacking:
            return jnp.full((size, size), 1.0 + 0.0j), xn
        x = 2.0 * jnp.pi * plane_w * nm1
        return jax.lax.complex(jnp.cos(sign * x), jnp.sin(sign * x)) * xn, xn

    def _correction(self, dtype):
        size = self.image_size
        idx = np.abs(np.arange(size) - size // 2)
        lc = self.conv_corr_kernel[idx]
        corr_lm = lc[:, None] * lc[None, :]
        if self.do_wstacking:
            l = (np.arange(size) - size // 2) * self.pixel_size
            ll, mm = np.meshgrid(l, l, indexing="ij")
            n = np.sqrt(1.0 - ll * ll - mm * mm) - 1.0
            n_conv = self._conv_corr(n * self.inv_w_scale) \
                * self.conv_corr_norm_factor ** 2
            corr = corr_lm * n_conv
        else:
            corr = corr_lm * self.conv_corr_norm_factor ** 2
        return jnp.asarray(1.0 / corr, dtype)

    # -- public operations ----------------------------------------------------
    def grid_uvw_es_fft(self, uvw: Array, freq_hz: Array, vis: Array,
                        weight: Array, dirty_image: Array) -> Array:
        """Grid visibilities into a dirty image
        (`sdp_grid_uvw_es_fft`, sdp_gridder_uvw_es_fft.h:71)."""
        uvw = jnp.asarray(uvw)
        freq_hz = jnp.asarray(freq_hz)
        vis = jnp.asarray(vis)
        weight = jnp.asarray(weight)
        dirty_image = jnp.asarray(dirty_image)
        if self._packed is not None and vis.dtype == jnp.complex64:
            from .es_fft_packed import grid_es_packed

            return grid_es_packed(
                self, self._packed, uvw, freq_hz, vis, weight,
                dirty_image, jax.default_backend() != "tpu")
        flip, pos_w, iu, iv, ku, kv = self._taps(uvw, freq_hz)
        vis_w = jnp.where((flip < 0)[:, None], jnp.conj(vis), vis) \
            * weight.astype(vis.dtype)
        support = self.support
        size = self.image_size
        G = self.grid_size
        lo = G // 2 - size // 2
        dirty = jnp.zeros((size, size), jnp.real(vis).dtype)
        half_support = support / 2.0
        for iw in range(self.num_total_w_grids):
            kw = _es_kernel(self.beta, (iw - pos_w) / half_support)  # [R,C]
            vals = (vis_w * kw.astype(vis.dtype))[..., None, None] \
                * (ku[..., :, None] * kv[..., None, :]).astype(vis.dtype)
            grid = jnp.zeros((G, G), vis.dtype).at[
                iu[..., :, None], iv[..., None, :]].add(vals)
            layer = ifft_shifted(grid)
            plane_w = iw * self.inv_w_scale + self.min_plane_w
            screen, _ = self._image_screens(plane_w, -1.0)
            crop = jax.lax.dynamic_slice(layer, (lo, lo), (size, size))
            dirty = dirty + (crop * screen.astype(crop.dtype)).real.astype(
                dirty.dtype)
        dirty = dirty * self._correction(dirty.dtype)
        return dirty_image + dirty.astype(dirty_image.dtype)

    def ifft_degrid_uvw_es_fft(self, uvw: Array, freq_hz: Array,
                               vis: Array, weight: Array,
                               dirty_image: Array) -> Array:
        """Degrid visibilities from a dirty image
        (`sdp_ifft_degrid_uvw_es_fft`, sdp_gridder_uvw_es_fft.h:95).
        Returns the accumulated visibilities (vis + contribution)."""
        uvw = jnp.asarray(uvw)
        freq_hz = jnp.asarray(freq_hz)
        vis = jnp.asarray(vis)
        dirty_image = jnp.asarray(dirty_image)
        if self._packed is not None and vis.dtype == jnp.complex64:
            from .es_fft_packed import degrid_es_packed

            return degrid_es_packed(
                self, self._packed, uvw, freq_hz, vis,
                jnp.asarray(weight), dirty_image,
                jax.default_backend() != "tpu")
        flip, pos_w, iu, iv, ku, kv = self._taps(uvw, freq_hz)
        support = self.support
        size = self.image_size
        G = self.grid_size
        lo = G // 2 - size // 2
        half_support = support / 2.0
        cdtype = vis.dtype
        corrected = dirty_image.astype(jnp.real(vis).dtype) \
            * self._correction(jnp.real(vis).dtype)
        acc = jnp.zeros_like(vis)
        for iw in range(self.num_total_w_grids):
            plane_w = iw * self.inv_w_scale + self.min_plane_w
            screen, _ = self._image_screens(plane_w, 1.0)
            layer = jnp.zeros((G, G), cdtype).at[
                lo:lo + size, lo:lo + size].set(
                (corrected * screen).astype(cdtype))
            grid = fft_shifted(layer)
            taps = grid[iu[..., :, None], iv[..., None, :]]  # [R,C,S,S]
            kw = _es_kernel(self.beta, (iw - pos_w) / half_support)
            contrib = jnp.einsum("rcu,rcv,rcuv->rc",
                                 ku.astype(cdtype), kv.astype(cdtype),
                                 taps) * kw.astype(cdtype)
            acc = acc + contrib
        acc = jnp.where((flip < 0)[:, None], jnp.conj(acc), acc)
        return vis + acc

    # Reference Python method name (gridder_uvw_es_fft.py:128) — the C
    # symbol is sdp_ifft_degrid_uvw_es_fft, the Python wrapper shipped
    # as ifft_grid_uvw_es; keep both spellings for drop-in use.
    ifft_grid_uvw_es = ifft_degrid_uvw_es_fft
