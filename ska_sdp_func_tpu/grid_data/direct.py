"""Direct (DFT) sub-grid (de)gridder — the brutally-exact accuracy oracle.

Reference: grid_data/sdp_gridder_direct.{h,cpp}. Same plan/API shape as the
w-towers gridder minus the w-kernels: degrid converts the non-zero pixels
to (flux, lmn) components and runs the exact DFT; grid runs the exact iDFT
over all pixels. Both apply the PSWF taper sampled over the sub-grid
(first sample forced to 1e-15; sdp_gridder_direct.cpp:50-55).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fourier_transforms.pswf import generate_pswf
from .grid_correct import grid_correct_pswf, grid_correct_w_stack
from .gridder_utils import dft, idft, image_lmn, image_to_flmn

Array = jax.Array


class GridderDirect:
    """Plan for direct (de)gridding using a DFT
    (`sdp_gridder_direct_create`, sdp_gridder_direct.h:57-76)."""

    def __init__(self, image_size: int, subgrid_size: int, theta: float,
                 w_step: float, shear_u: float, shear_v: float,
                 support: int):
        self.image_size = int(image_size)
        self.subgrid_size = int(subgrid_size)
        self.theta = float(theta)
        self.w_step = float(w_step)
        self.shear_u = float(shear_u)
        self.shear_v = float(shear_v)
        self.support = int(support)
        pswf = generate_pswf(0, support * (np.pi / 2), self.subgrid_size)
        pswf[0] = 1e-15
        self.pswf_sg = pswf

    def degrid_subgrid(self, subgrid_image: Array,
                       subgrid_offset: Tuple[int, int, int], ch_count: int,
                       freq0_hz: float, dfreq_hz: float, uvws: Array,
                       start_chs: Array, end_chs: Array,
                       vis: Optional[Array] = None) -> Array:
        """Degrid via DFT over the non-zero, PSWF-tapered pixels
        (`sdp_gridder_direct_degrid`, sdp_gridder_direct.cpp:60-101)."""
        off_u, off_v, off_w = (int(o) for o in subgrid_offset)
        flux, lmn = image_to_flmn(np.asarray(subgrid_image), self.theta,
                                  self.shear_u, self.shear_v, self.pswf_sg)
        return dft(jnp.asarray(uvws), jnp.asarray(flux), jnp.asarray(lmn),
                   jnp.asarray(start_chs), jnp.asarray(end_chs),
                   off_u, off_v, off_w, self.theta, self.w_step,
                   freq0_hz, dfreq_hz, ch_count, vis)

    def grid_subgrid(self, vis: Array, uvws: Array, start_chs: Array,
                     end_chs: Array, ch_count: int, freq0_hz: float,
                     dfreq_hz: float, subgrid_image: Array,
                     subgrid_offset: Tuple[int, int, int]) -> Array:
        """Grid via iDFT over all pixels, PSWF-tapered
        (`sdp_gridder_direct_grid`, sdp_gridder_direct.cpp:127-166)."""
        off_u, off_v, off_w = (int(o) for o in subgrid_offset)
        subgrid_image = jnp.asarray(subgrid_image)
        lmn = image_lmn(subgrid_image.shape, self.theta, self.shear_u,
                        self.shear_v)
        return idft(jnp.asarray(uvws), jnp.asarray(vis), lmn,
                    jnp.asarray(start_chs), jnp.asarray(end_chs),
                    jnp.asarray(self.pswf_sg), off_u, off_v, off_w,
                    self.theta, self.w_step, freq0_hz, dfreq_hz,
                    image=subgrid_image)

    def degrid_correct(self, facet: Array, facet_offset_l: int = 0,
                       facet_offset_m: int = 0, w_offset: int = 0) -> Array:
        """PSWF image correction without a w-kernel term
        (`sdp_gridder_direct_degrid_correct`)."""
        facet = grid_correct_pswf(self.image_size, self.theta, self.w_step,
                                  self.shear_u, self.shear_v, self.support,
                                  0, facet, facet_offset_l, facet_offset_m)
        if jnp.issubdtype(facet.dtype, jnp.complexfloating):
            facet = grid_correct_w_stack(
                self.image_size, self.theta, self.w_step, self.shear_u,
                self.shear_v, facet, facet_offset_l, facet_offset_m,
                w_offset, inverse=False)
        return facet

    def grid_correct(self, facet: Array, facet_offset_l: int = 0,
                     facet_offset_m: int = 0, w_offset: int = 0) -> Array:
        facet = grid_correct_pswf(self.image_size, self.theta, self.w_step,
                                  self.shear_u, self.shear_v, self.support,
                                  0, facet, facet_offset_l, facet_offset_m)
        if jnp.issubdtype(facet.dtype, jnp.complexfloating):
            facet = grid_correct_w_stack(
                self.image_size, self.theta, self.w_step, self.shear_u,
                self.shear_v, facet, facet_offset_l, facet_offset_m,
                w_offset, inverse=True)
        return facet
