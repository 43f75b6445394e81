"""Prolate spheroidal wave functions (PSWF).

The PSWF is the anti-aliasing window for all gridders and for SwiFTly.
Reference: fourier_transforms/sdp_pswf.{h,cpp} evaluates S_mn(c, x) via
f2c-converted scipy `specfun.f` routines (aswfa/sdmn/sckb/segv) and
`sdp_generate_pswf` samples it symmetrically over a grid
(sdp_pswf.cpp:569-601); the reference's own test oracle uses
`scipy.special.pro_ang1` directly (tests/grid_data/
test_gridder_wtower_uvw.py:214-220).

Two evaluation paths:

- **Host path** (plan time): `scipy.special.pro_ang1`, bit-matching the
  reference's specfun numerics.
- **Device path** (jittable): a clean-room Legendre-expansion evaluation.
  The expansion coefficients d_r of S_0n(c, x) = sum_r d_r P_r(x) solve the
  classical Bouwkamp three-term recurrence eigenproblem (Flammer 1957,
  eq. 3.1.4); we symmetrise the tridiagonal matrix and use a banded
  eigensolver, then apply the Flammer normalisation
  sum_r (-1)^{r/2} r! / (2^r ((r/2)!)^2) d_r = P_n(0). Absolute accuracy vs
  specfun is ~1e-13 (support 10) which is far below gridding-kernel error
  budgets; oracle-parity paths use the host path.
"""

from functools import partial, lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..utility.errors import SdpInvalidArgumentError

Array = jax.Array


def _pro_ang1(m: int, n: int, c: float, x):
    """scipy prolate angular function of the first kind, elementwise."""
    from scipy.special import pro_ang1

    x = np.asarray(x, dtype=np.float64)
    # pro_ang1 is defined on |x| < 1; outside, the window is zero
    # (matches sdp_pswf_evaluate, sdp_pswf.cpp:680-685).
    inside = np.abs(x) < 1.0
    safe = np.where(inside, x, 0.0)
    vals = pro_ang1(m, n, c, safe)[0]
    return np.where(inside, vals, 0.0)


def generate_pswf(m: int, c: float, size: int,
                  end_correction: bool = False) -> np.ndarray:
    """Sample PSWF over ``size`` points, x_k = 2*(k - size//2)/size.

    Matches `sdp_generate_pswf` / `sdp_pswf_generate`
    (sdp_pswf.cpp:569-601): the first sample (x = -1 for even size) is zero,
    or 1e-15 when ``end_correction`` is set — the same correction
    `make_pswf_kernel` applies (sdp_gridder_utils.cpp:1329-1350).

    Host (numpy) computation: this is plan-time setup, not a hot path.
    """
    if size < 1:
        raise SdpInvalidArgumentError(f"size must be >= 1; got {size}")
    k = np.arange(size)
    x = 2.0 * (k - size // 2) / size
    out = _pro_ang1(m, m, c, x)
    if size % 2 == 0:
        out[0] = 1e-15 if end_correction else 0.0
    return out


def pswf_evaluate_host(m: int, c: float, x) -> np.ndarray:
    """Pointwise host evaluation; zero outside |x| < 1."""
    return _pro_ang1(m, m, c, x)


@lru_cache(maxsize=64)
def _coefficients_cached(c: float, num_terms: int) -> tuple:
    from scipy.linalg import eigh_tridiagonal
    from scipy.special import gammaln

    r = np.arange(0, 2 * num_terms, 2).astype(np.float64)
    c2 = c * c
    # Bouwkamp recurrence coefficients for m = 0, even r
    # (coefficient of d_{r+2}, the diagonal term, and d_{r-2}).
    upper = (r + 2) * (r + 1) * c2 / ((2 * r + 3) * (2 * r + 5))
    diag = r * (r + 1) + (2 * r * (r + 1) - 1) * c2 / (
        (2 * r - 1) * (2 * r + 3))
    lower = r * (r - 1) * c2 / ((2 * r - 3) * (2 * r - 1))
    # Symmetrise (products upper[k]*lower[k+1] are positive).
    off = np.sqrt(upper[:-1] * lower[1:])
    _, vecs = eigh_tridiagonal(diag, off, select="i", select_range=(0, 0))
    v = vecs[:, 0]
    scale = np.ones(num_terms)
    scale[1:] = np.cumprod(np.sqrt(lower[1:] / upper[:-1]))
    d = v * scale
    # Flammer normalisation for n = m = 0: S(0) = P_0(0) = 1.
    log_fac = gammaln(r + 1) - r * np.log(2.0) - 2 * gammaln(r / 2 + 1)
    fac = ((-1.0) ** (r / 2)) * np.exp(log_fac)
    d = d / np.dot(fac, d)
    return tuple(d)


def pswf_coefficients(c: float, num_terms: int = 150) -> np.ndarray:
    """Legendre expansion coefficients d_r (even r) of S_00(c, x)."""
    return np.asarray(_coefficients_cached(float(c), int(num_terms)))


@partial(jax.jit, static_argnames=("num_terms",))
def _legendre_even_sum(x: Array, d: Array, num_terms: int) -> Array:
    """sum_k d[k] * P_{2k}(x) via the Legendre three-term recurrence."""
    x = jnp.asarray(x)
    p_prev = jnp.ones_like(x)   # P_0
    p_curr = x                  # P_1
    acc = d[0] * p_prev

    def body(carry, k):
        p_prev, p_curr, acc = carry
        # advance twice: P_{2k-1} -> P_{2k}
        def step(p_prev, p_curr, n):
            nf = n.astype(x.dtype)
            p_next = ((2.0 * nf + 1.0) * x * p_curr - nf * p_prev) / (nf + 1.0)
            return p_curr, p_next
        p_prev, p_curr = step(p_prev, p_curr, 2 * k - 1)
        acc = acc + d[k] * p_curr
        p_prev, p_curr = step(p_prev, p_curr, 2 * k)
        return (p_prev, p_curr, acc), None

    (p_prev, p_curr, acc), _ = jax.lax.scan(
        body, (p_prev, p_curr, acc), jnp.arange(1, num_terms))
    return acc


def pswf_evaluate(x: Array, coefficients: Array) -> Array:
    """Jittable PSWF evaluation from Legendre coefficients; 0 for |x| >= 1."""
    x = jnp.asarray(x)
    d = jnp.asarray(coefficients, dtype=x.dtype)
    inside = jnp.abs(x) < 1.0
    vals = _legendre_even_sum(jnp.where(inside, x, 0.0), d, d.shape[0])
    return jnp.where(inside, vals, 0.0)


class Pswf:
    """PSWF plan: caches samples and expansion coefficients.

    Mirrors `sdp_Pswf` (sdp_pswf.h:62-97): created from (m, c), can emit
    sampled values (`values`) and evaluate pointwise (`evaluate`). The
    jittable coefficient path is exposed via `coefficients` /
    `evaluate_device`.
    """

    def __init__(self, m: int, c: float):
        if m != 0:
            # The library only ever uses m = 0 (all call sites pass 0);
            # the host path supports any m, the device path m = 0.
            pass
        self.m = int(m)
        self.c = float(c)
        self._values = {}

    def values(self, size: int, end_correction: bool = False) -> np.ndarray:
        key = (size, end_correction)
        if key not in self._values:
            self._values[key] = generate_pswf(
                self.m, self.c, size, end_correction)
        return self._values[key]

    def evaluate(self, x) -> np.ndarray:
        return pswf_evaluate_host(self.m, self.c, x)

    @property
    def coefficients(self) -> np.ndarray:
        if self.m != 0:
            raise SdpInvalidArgumentError(
                "device-path coefficients only implemented for m = 0")
        return pswf_coefficients(self.c)

    def evaluate_device(self, x: Array) -> Array:
        return pswf_evaluate(x, jnp.asarray(self.coefficients))
