"""FISTA sparse imaging solver on the packed measurement operators.

The north-star solver family (BASELINE.json) is "first-order
CLEAN/FISTA-style major/minor cycles": alongside the CLEAN solver
(:mod:`.major_cycle`), this module solves the same inverse problem

    min_x  0.5 * || V - A x ||^2  +  lam * || x ||_1

with FISTA (Beck & Teboulle 2009): proximal gradient steps through the
exact forward/adjoint pair (``A`` = packed degrid, ``A^T`` = packed
grid) with Nesterov momentum. Every iteration is two packed kernel
passes plus O(N^2) elementwise work, so the per-iteration cost matches
one CLEAN major cycle without the minor-cycle loop.

The step size is 1/L with L = ||A^T A|| estimated by power iteration
on the device (the PSF peak normalisation used by CLEAN is exactly
L for a uniformly-weighted operator; the power iteration handles
weighted/flagged streams for free).
"""

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel.wstack import WStackPlan

Array = jax.Array


@dataclass
class FistaResult:
    """Solver outputs: sparse model image and objective history."""

    model: Array
    residual_norm: List[float]


@jax.jit
def _soft_threshold(x, lam):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)


def _operator_norm(gridder, mask, image_size: int, n_iter: int = 8,
                   seed: int = 0) -> float:
    """||M A^T A M|| by power iteration through the packed kernels
    (M = the CLEAN-window border mask: the 1/PSWF grid corrections
    diverge in the border ring, so the solve — like CLEAN's minor
    cycle — runs in the windowed interior subspace)."""
    rng = np.random.default_rng(seed)
    x = mask * jnp.asarray(
        rng.standard_normal((image_size, image_size)), jnp.float32)
    norm = jax.jit(lambda v: jnp.sqrt(jnp.sum(v * v)))
    sigma = 1.0
    for _ in range(n_iter):
        x = x / norm(x)
        pred = gridder.degrid_sorted(x)
        x = mask * gridder.grid_sorted(pred.real, pred.imag)
        sigma = float(norm(x))
    return sigma


def fista_imager(plan: WStackPlan, vis: Array, uvw: Array,
                 n_iter: int = 50, lam_frac: float = 1e-3,
                 weights: Optional[Array] = None,
                 border: Optional[int] = None,
                 mesh=None) -> FistaResult:
    """Run the FISTA sparse solve through the packed operators.

    ``lam_frac``: the L1 weight as a fraction of the peak of the
    (normalised) dirty image — the same peak-relative scaling CLEAN
    thresholds use. ``border`` (default image_size//8) is the CLEAN
    window margin: the model is solved on the interior where the
    1/PSWF grid corrections are well-conditioned (the reference
    excludes the same ring, test_gridder_wtower_uvw.py:2188-2193).
    With ``mesh`` the grid/degrid passes run block-sharded with
    `psum` reduction (the packed sharded drivers).
    """
    from ..parallel.packed import packed_gridder, plan_packed

    pad_to = int(mesh.devices.size) if mesh is not None else 1
    pplan = plan_packed(plan, np.asarray(uvw), pad_blocks_to=pad_to)
    g = packed_gridder(pplan)

    vis = jnp.asarray(vis)
    if weights is not None:
        vis = vis * jnp.asarray(weights).astype(vis.dtype)
    vre, vim = g.sort(vis)
    if weights is not None:
        w_sorted = g.sort(jnp.asarray(weights).astype(vis.dtype))[0]
    else:
        w_sorted = None

    if border is None:
        border = plan.image_size // 8
    from .major_cycle import _mask_border

    mask = _mask_border(
        jnp.ones((plan.image_size, plan.image_size), jnp.float32),
        int(border))

    if mesh is not None:
        grid = lambda re, im: mask * g.grid_sorted_sharded(re, im,
                                                           mesh)
        degrid = lambda x: g.degrid_sorted_sharded(x, mesh)
    else:
        grid = jax.jit(
            lambda re, im: mask * g.grid_sorted(re, im))
        degrid = g.degrid_sorted

    sigma = _operator_norm(g, mask, plan.image_size)
    step = jnp.float32(1.0 / sigma)

    dirty = grid(vre, vim)
    lam = jnp.float32(lam_frac) * jnp.max(jnp.abs(dirty)) / sigma

    @jax.jit
    def _residual(vre, vim, pred, w):
        pre, pim = pred.real, pred.imag
        if w is not None:
            pre, pim = pre * w, pim * w
        return vre - pre, vim - pim

    @jax.jit
    def _update(y, grad, x_prev, t_prev):
        x = _soft_threshold(y + step * grad, step * lam * sigma)
        t = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t_prev * t_prev))
        y_next = x + ((t_prev - 1.0) / t) * (x - x_prev)
        return x, y_next, t

    x = jnp.zeros((plan.image_size, plan.image_size), jnp.float32)
    y = x
    t = jnp.float32(1.0)
    history: List[float] = []
    rnorm = jax.jit(lambda a, b: jnp.sqrt(jnp.sum(a * a + b * b)))
    for _ in range(int(n_iter)):
        pred = degrid(y)
        res_re, res_im = _residual(vre, vim, pred, w_sorted)
        grad = grid(res_re, res_im)
        x, y, t = _update(y, grad, x, t)
        history.append(float(rnorm(res_re, res_im)))
    return FistaResult(model=x, residual_norm=history)
