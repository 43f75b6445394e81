"""Unit tests for bench.py's roofline/byte models (CPU-only).

The bench's sanity assertion (measured <= engine roofline) is only as
good as these models tracking the engine configuration — BENCH_r04
published an impossible ratio because they drifted (VERDICT r4 #2).
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402

from ska_sdp_func_tpu.parallel import plan_wstack  # noqa: E402
from ska_sdp_func_tpu.parallel.packed import (  # noqa: E402
    packed_gridder,
    plan_packed,
)

C_0 = 299792458.0


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(2)
    rows, chans, image, subgrid = 200, 2, 256, 128
    uvw = rng.uniform(-1, 1, (rows, 3))
    uvw[:, :2] *= 0.3 * image / 2 / 0.002
    uvw[:, 2] *= 1.2 * 100.0 * 4.0
    plan = plan_wstack(uvw, C_0, C_0 / 100, chans, image, subgrid,
                       0.002, 100.0, support=8, w_support=4,
                       w_tower_height=4.0)
    pplan = plan_packed(plan, uvw, block_v=128)
    return plan, pplan, rows * chans


def test_grid_stream_bytes_tracks_engine(small):
    plan, pplan, _ = small
    g_band = packed_gridder(pplan, engine="bands", precision="highest")
    g_high = packed_gridder(pplan, engine="bands", precision="high")
    g_fused = packed_gridder(pplan, engine="fused")
    # Band engine: ubase 64 + vband lanes*4 + wk_t Sw*4 + vis 8.
    assert bench._grid_stream_bytes_per_slot(g_band) == \
        64.0 + 128 * 4.0 + 16.0 + 8.0
    # 'high' splits vband into two bf16 halves — SAME bytes as f32.
    assert bench._grid_stream_bytes_per_slot(g_high) == \
        bench._grid_stream_bytes_per_slot(g_band)
    # Fused engine: two packed words + vis planes.
    assert bench._grid_stream_bytes_per_slot(g_fused) == 16.0


def test_attainable_monotone_in_bandwidth_and_flops(small):
    plan, pplan, nvis = small
    g = packed_gridder(pplan, engine="bands", precision="highest")
    sol1, eng1 = bench._attainable_mvis(pplan, g, nvis, 300.0, 30.0)
    sol2, eng2 = bench._attainable_mvis(pplan, g, nvis, 600.0, 30.0)
    sol3, eng3 = bench._attainable_mvis(pplan, g, nvis, 300.0, 60.0)
    assert sol2 >= sol1 and eng2 >= eng1        # more bandwidth
    assert sol3 >= sol1 and eng3 >= eng1        # more FLOP/s
    # The engine bound can never exceed the algorithm speed of light.
    assert eng1 <= sol1 and eng2 <= sol2 and eng3 <= sol3


def test_measure_returns_median_and_spread():
    calls = {"n": 0}

    def step():
        calls["n"] += 1

    dt, spread = bench._measure(step, lambda: None, iters=5, n_meas=3)
    # 1 warm loop + 3 measured loops of 5 iters each.
    assert calls["n"] == 4 * 5
    assert dt >= 0.0 and spread >= 0.0
