"""ES-kernel parameter selection over the (support, sigma, beta) space.

Role match: ``sdp_calculate_params_from_epsilon``
(/root/reference/src/ska-sdp-func/grid_data/sdp_gridder_uvw_es_fft_utils.cpp:225-537),
which picks (support, oversampling sigma, beta) from a 244-entry tuned
database so a requested accuracy ``epsilon`` is met with the smallest
padded grid — the grid-memory-vs-support trade SKA pipelines tune
(sigma 1.15..2.5).

This implementation derives the same trade space analytically instead
of shipping a measured table: for each (support w, sigma) it computes
the NUFFT aliasing error of the exponential-of-semicircle kernel from
its continuous Fourier transform and optimises beta by golden section.
With the kernel viewed in grid coordinates, ``psi(u) = es(u / (w/2))``
on |u| <= w/2, its transform at frequency ``s`` (cycles per grid cell)
is

    psi_hat(s) = w * int_0^1 es(x) cos(pi s w x) dx

(the exact quadrature form the conv-correction uses, es_fft.py
``_conv_corr``). Sampling at integer grid cells aliases ``s +- m``;
image pixels live in the band |s| <= 1/(2 sigma), so the relative
aliasing error at s is

    E(s) = sqrt(sum_{m>=1} psi_hat(m - s)^2 + psi_hat(m + s)^2)
           / psi_hat(s)

and the kernel's achievable epsilon is ``max_s E(s)`` over the band
(worst at the band edge). This is the standard windowed-NUFFT error
estimate (Barnett et al. 2019); the resulting (support, sigma) ->
epsilon map reproduces the shape of the reference's measured DB.

Selection mirrors the reference's objective: among all (support <=
max_support, sigma in the DB's 1.15..2.5 range) meeting epsilon, keep
per-support the smallest sigma, then pick the candidate minimising the
padded grid size; the conv-correction dynamic range is capped at 10
like the reference's ``K_corr_range`` cut.
"""

import math
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from ..fourier_transforms.fft import padded_fft_size

# The reference DB's oversampling grid (sigma axis).
SIGMA_MIN, SIGMA_MAX, SIGMA_STEP = 1.15, 2.50, 0.05
_N_QUAD = 512            # GL order; integrand oscillates up to ~pi*s*w
_N_ALIAS = 8             # aliases summed (psi_hat decays fast beyond)
_CORR_RANGE_MAX = 10.0   # reference feasibility cut (K_corr_range)


@lru_cache(maxsize=None)
def _gl_nodes():
    nodes, weights = np.polynomial.legendre.leggauss(2 * _N_QUAD)
    pos = nodes > 0
    return nodes[pos], weights[pos]


def _psi_hat(support: int, beta: float, s: np.ndarray) -> np.ndarray:
    """w * int_0^1 es(x) cos(pi s w x) dx for an array of s."""
    x, wq = _gl_nodes()
    ker = np.exp(beta * (np.sqrt(1.0 - x * x) - 1.0)) * wq
    phases = np.pi * np.asarray(s, np.float64)[..., None] * support * x
    return support * np.sum(ker * np.cos(phases), axis=-1)


def alias_error(support: int, sigma: float, beta: float) -> float:
    """max over the image band of the relative aliasing error E(s)."""
    s = np.linspace(0.0, 0.5 / sigma, 17)
    main = _psi_hat(support, beta, s)
    m = np.arange(1, _N_ALIAS + 1, dtype=np.float64)
    tails = _psi_hat(support, beta, m[:, None] - s[None, :]) ** 2 \
        + _psi_hat(support, beta, m[:, None] + s[None, :]) ** 2
    err = np.sqrt(np.sum(tails, axis=0)) / np.abs(main)
    return float(np.max(err))


def corr_range(support: int, sigma: float, beta: float) -> float:
    """Conv-correction dynamic range C(0)/C(band edge)."""
    edge = _psi_hat(support, beta, np.array([0.0, 0.5 / sigma]))
    return float(edge[0] / max(edge[1], 1e-300))


@lru_cache(maxsize=None)
def tune_beta(support: int, sigma: float) -> Tuple[float, float]:
    """(beta, epsilon) minimising the aliasing error at (support, sigma).

    Coarse scan over beta in [0.8, 2.8] * support, then golden-section
    refinement around the best coarse point — E(beta) has a clear
    global basin (small beta: mainlobe aliases; large beta: truncation
    at |x|=1) but small secondary wiggles that would trap a pure
    golden section.
    """
    bs = np.linspace(0.8 * support, 2.8 * support, 41)
    errs = [alias_error(support, sigma, float(b)) for b in bs]
    k = int(np.argmin(errs))
    a = float(bs[max(k - 1, 0)])
    b = float(bs[min(k + 1, len(bs) - 1)])
    gr = (math.sqrt(5.0) - 1.0) / 2.0
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = alias_error(support, sigma, c), alias_error(support, sigma, d)
    for _ in range(30):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = alias_error(support, sigma, c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = alias_error(support, sigma, d)
    beta = 0.5 * (a + b)
    return beta, alias_error(support, sigma, beta)


def _sigma_grid():
    n = int(round((SIGMA_MAX - SIGMA_MIN) / SIGMA_STEP)) + 1
    return [round(SIGMA_MIN + i * SIGMA_STEP, 2) for i in range(n)]


def calculate_params_from_epsilon(
        epsilon: float, image_size: int, single_precision: bool,
        sigma: Optional[float] = None,
) -> Tuple[int, int, float, float]:
    """(grid_size, support, beta, sigma) meeting ``epsilon``.

    ``sigma=None`` searches the DB's 1.15..2.5 range and picks the
    candidate minimising the padded grid size (the reference's
    objective); a numeric ``sigma`` pins the oversampling factor (the
    grid-memory budget) and selects the smallest feasible support.
    Raises ValueError when no (support <= max) kernel meets epsilon —
    same failure mode as the reference's epsilon bounds check
    (sdp_gridder_uvw_es_fft.cpp:316-323 limits epsilon >= 1e-12
    double / 1e-5 float; infeasible combinations surface here).
    """
    max_support = 8 if single_precision else 16
    sigmas = _sigma_grid() if sigma is None else [float(sigma)]

    best = None  # (grid_size, support, beta, sigma)
    for w in range(4, max_support + 1):
        for sg in sigmas:
            beta, eps = tune_beta(w, sg)
            if eps > epsilon:
                continue
            if corr_range(w, sg, beta) > _CORR_RANGE_MAX:
                continue
            gs = padded_fft_size(int(math.ceil(image_size * sg)))
            if best is None or gs < best[0] \
                    or (gs == best[0] and w < best[1]):
                best = (gs, w, beta, sg)
            break  # larger sigma at this support only costs more grid
    if best is None:
        raise ValueError(
            f"no ES kernel (support <= {max_support}, sigma in "
            f"{sigmas[0]}..{sigmas[-1]}) reaches epsilon={epsilon:g}")
    gs, w, _, sg = best
    # Rounding the grid up raises the effective oversampling; retune
    # beta there — strictly more accurate for the same cost.
    sigma_eff = gs / float(image_size)
    beta, _ = tune_beta(w, round(sigma_eff, 6))
    return gs, w, beta, sigma_eff
