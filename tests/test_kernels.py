"""Inner-tap kernel implementations agree with each other.

The scatter formulation is validated against the in-file NumPy oracle in
test_wtower.py; here the dense banded-matmul path and the Pallas TPU
kernel (interpreter mode on CPU) are validated against the scatter path
and against each other — the implementation-consistency pattern the
reference uses for GPU-vs-CPU (tests/grid_data/test_gridder_wtower_uvw.py
:1848,1869).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_func_tpu.grid_data.wtower import (
    GridderWtowerUVW,
    _degrid_plane,
    _grid_plane_scatter,
    _plane_geometry,
)
from ska_sdp_func_tpu.kernels.dense_tap import (
    degrid_plane_dense,
    grid_plane_dense,
)
from ska_sdp_func_tpu.kernels.pallas_tap import (
    degrid_plane_pallas,
    grid_plane_pallas,
)

C_0 = 299792458.0
SG = 32
SUPPORT, W_SUPPORT = 8, 4


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    num_rows, num_chan = 100, 3
    theta, w_step = 0.002, 100.0
    freq0, dfreq = C_0, C_0 / (100 * num_chan)
    uvw = rng.uniform(-1, 1, (num_rows, 3))
    uvw[:, :2] *= 0.4 * SG / 2 / theta
    uvw[:, 2] *= 1.5 * w_step
    vis = (rng.standard_normal((num_rows, num_chan))
           + 1j * rng.standard_normal((num_rows, num_chan)))
    plan = GridderWtowerUVW(SG, SG, theta, w_step, 0, 0, SUPPORT, 16384,
                            W_SUPPORT, 16384)
    geom = _plane_geometry(
        jnp.asarray(uvw), jnp.zeros(num_rows, jnp.int32),
        jnp.full(num_rows, num_chan, jnp.int32), jnp.asarray(0),
        jnp.asarray(0), jnp.asarray(0), jnp.asarray(0), freq0, dfreq,
        num_chan, theta, w_step, SUPPORT, 16384, W_SUPPORT, 16384, SG,
        0, num_rows)
    uvk = jnp.asarray(plan.uv_kernel)
    wk = jnp.asarray(plan.w_kernel)
    vis = jnp.asarray(vis)
    subgrids = jnp.asarray(
        rng.standard_normal((W_SUPPORT, SG, SG))
        + 1j * rng.standard_normal((W_SUPPORT, SG, SG)))
    return dict(geom=geom, uvk=uvk, wk=wk, vis=vis, subgrids=subgrids)


def test_dense_grid_matches_scatter_f64(setup):
    s = setup
    zero = jnp.zeros((W_SUPPORT, SG, SG), s["vis"].dtype)
    ref = _grid_plane_scatter(zero, s["vis"], s["uvk"], s["wk"], s["geom"],
                              SUPPORT, W_SUPPORT)
    out = grid_plane_dense(zero, s["vis"], s["uvk"], s["wk"], s["geom"],
                           SUPPORT, W_SUPPORT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)


def test_dense_degrid_matches_gather_f64(setup):
    s = setup
    ref = _degrid_plane(s["subgrids"], s["uvk"], s["wk"], s["geom"],
                        SUPPORT, W_SUPPORT)
    out = degrid_plane_dense(s["subgrids"], s["uvk"], s["wk"], s["geom"],
                             SUPPORT, W_SUPPORT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)


def test_pallas_grid_interpret_matches_dense(setup):
    s = setup
    vis32 = s["vis"].astype(jnp.complex64)
    zero = jnp.zeros((W_SUPPORT, SG, SG), jnp.complex64)
    ref = grid_plane_dense(zero, vis32, s["uvk"].astype(jnp.float32),
                           s["wk"].astype(jnp.float32), s["geom"],
                           SUPPORT, W_SUPPORT)
    out = grid_plane_pallas(zero, vis32, s["uvk"].astype(jnp.float32),
                            s["wk"].astype(jnp.float32), s["geom"],
                            SUPPORT, W_SUPPORT, block_v=128,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_pallas_degrid_interpret_matches_dense(setup):
    s = setup
    sub32 = s["subgrids"].astype(jnp.complex64)
    ref = degrid_plane_dense(sub32, s["uvk"].astype(jnp.float32),
                             s["wk"].astype(jnp.float32), s["geom"],
                             SUPPORT, W_SUPPORT)
    out = degrid_plane_pallas(sub32, s["uvk"].astype(jnp.float32),
                              s["wk"].astype(jnp.float32), s["geom"],
                              SUPPORT, W_SUPPORT, block_v=128,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_dense_adjointness(setup):
    s = setup
    rng = np.random.default_rng(2)
    zero = jnp.zeros((W_SUPPORT, SG, SG), s["vis"].dtype)
    aty = grid_plane_dense(zero, s["vis"], s["uvk"], s["wk"], s["geom"],
                           SUPPORT, W_SUPPORT)
    ax = degrid_plane_dense(s["subgrids"], s["uvk"], s["wk"], s["geom"],
                            SUPPORT, W_SUPPORT)
    lhs = np.vdot(np.asarray(ax), np.asarray(s["vis"]))
    rhs = np.vdot(np.asarray(s["subgrids"]), np.asarray(aty))
    assert abs(lhs - rhs) / abs(lhs) < 1e-13


@pytest.mark.verylong
@pytest.mark.slow
def test_sparse_grid_interpret_matches_dense():
    """Sparse per-vis kernel (prototype) against the dense banded path."""
    from ska_sdp_func_tpu.kernels.pallas_tap import grid_all_layers_pallas
    from ska_sdp_func_tpu.kernels.sparse_tap import grid_all_layers_sparse

    rng = np.random.default_rng(0)
    V, N, S, SW, K = 300, 32, 8, 4, 7
    iu0 = jnp.asarray(rng.integers(0, N - S, V).astype(np.int32))
    iv0 = jnp.asarray(rng.integers(0, N - S, V).astype(np.int32))
    j = rng.integers(0, K - SW + 1, V).astype(np.int32)
    uk = jnp.asarray(rng.random((V, S), np.float32))
    vk = jnp.asarray(rng.random((V, S), np.float32))
    wk = jnp.asarray(rng.random((V, SW), np.float32))
    vre = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    vim = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    weights = np.zeros((V, K), np.float32)
    for layer in range(SW):
        weights[np.arange(V), j + layer] = np.asarray(wk)[:, layer]
    ref = grid_all_layers_pallas(vre, vim, iu0, iv0, uk, vk,
                                 jnp.asarray(weights), K, N, S,
                                 block_v=128, interpret=True)
    got = grid_all_layers_sparse(vre, vim, iu0, iv0, jnp.asarray(j), uk,
                                 vk, wk, K, N, S, SW, block_v=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)
