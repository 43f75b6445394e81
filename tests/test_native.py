"""Native host-runtime tests: C++ results match the NumPy fallback and
the jnp implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_tpu import native
from ska_sdp_func_tpu.grid_data import uvw_bounds_all

C_0 = 299792458.0


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    uvw = rng.uniform(-1, 1, (500, 3)) * [[8000.0, 8000.0, 400.0]]
    start = np.zeros(500, np.int32)
    end = np.full(500, 4, np.int32)
    return uvw, start, end


def test_native_compiles():
    assert native.available(), "native host runtime failed to build"


def test_uvw_bounds_matches_jnp(data):
    uvw, start, end = data
    lo_n, hi_n = native.uvw_bounds(uvw, C_0, C_0 / 400, start, end)
    lo_j, hi_j = uvw_bounds_all(jnp.asarray(uvw), C_0, C_0 / 400,
                                jnp.asarray(start), jnp.asarray(end))
    np.testing.assert_allclose(lo_n, np.asarray(lo_j), rtol=1e-12)
    np.testing.assert_allclose(hi_n, np.asarray(hi_j), rtol=1e-12)


def test_plan_boxes_native_matches_numpy(data):
    uvw, start, end = data
    args = (uvw, C_0, C_0 / 400, 4, 300.0, 200.0,
            (-2, 2), (-2, 2), (-1, 1))
    c_n, lo_n, hi_n = native.plan_wstack_boxes(*args)
    c_p, lo_p, hi_p = native._plan_wstack_boxes_np(
        uvw, C_0, C_0 / 400, 4, 300.0, 200.0, -2, 5, -2, 5, -1, 3)
    np.testing.assert_array_equal(c_n, c_p)
    sel = c_n > 0
    np.testing.assert_allclose(lo_n[sel], lo_p[sel], rtol=1e-12)
    np.testing.assert_allclose(hi_n[sel], hi_p[sel], rtol=1e-12)
    # Every selected visibility is counted exactly once across w-planes.
    assert c_n.sum() > 0


def test_sort_and_prefix(data):
    uvw, _, _ = data
    perm = native.sort_rows_by_w(uvw)
    w = uvw[perm, 2]
    assert np.all(np.diff(w) >= 0)
    counts = np.asarray([3, 0, 5, 2], np.int64)
    np.testing.assert_array_equal(native.prefix_sum(counts),
                                  [0, 3, 3, 8, 10])
