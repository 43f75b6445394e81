"""Packed bucket-blocked kernels agree with an in-file NumPy oracle.

The band-streaming packed kernels (kernels/packed_tap.py) are the
round-2 performance path; validated here in interpreter mode against a
direct NumPy scatter/gather oracle (the reference's oracle pattern,
tests/grid_data/test_gridder_wtower_uvw.py), at the f32 rounding floor.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ska_sdp_func_tpu.kernels.packed_tap import (
    WIN_ROWS,
    build_bands,
    degrid_fused_pallas,
    grid_packed_pallas,
)

S, SW = 8, 4
LANES = 128
NUM_K = 10
NUM_SLABS = NUM_K - SW + 1
G = LANES // 8
BLOCK = 128


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    num = 1000
    iu0 = rng.integers(0, LANES - S + 1, num)
    iv0 = rng.integers(0, LANES - S + 1, num)
    k0 = rng.integers(0, NUM_SLABS, num)
    uk = rng.standard_normal((num, S)).astype(np.float32)
    vk = rng.standard_normal((num, S)).astype(np.float32)
    wk = rng.standard_normal((num, SW)).astype(np.float32)
    vis = (rng.standard_normal(num)
           + 1j * rng.standard_normal(num)).astype(np.complex64)

    # Host bucket sort by (slab, u-octet), padded to BLOCK multiples.
    octet = iu0 // 8
    bucket = (k0 * G + octet).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    chunks = []
    for bid in range(NUM_SLABS * G):
        sel = order[bucket[order] == bid]
        if sel.size:
            chunks.append((bid, sel, (-sel.size) % BLOCK))
    total = sum(s.size + p for _, s, p in chunks)
    idx = np.zeros(total, np.int64)
    valid = np.zeros(total, bool)
    block_bucket = np.zeros(total // BLOCK, np.int32)
    pos = blk = 0
    for bid, sel, pad in chunks:
        idx[pos:pos + sel.size] = sel
        valid[pos:pos + sel.size] = True
        nb = (sel.size + pad) // BLOCK
        block_bucket[blk:blk + nb] = bid
        pos += sel.size + pad
        blk += nb

    wk_s = np.where(valid[:, None], wk[idx], 0.0).astype(np.float32)
    ubase, vband, vband_t = build_bands(
        jnp.asarray((iu0 % 8)[idx].astype(np.int32)),
        jnp.asarray(iv0[idx].astype(np.int32)),
        jnp.asarray(uk[idx]), jnp.asarray(vk[idx]), LANES)
    return dict(rng=rng, num=num, iu0=iu0, iv0=iv0, k0=k0, uk=uk, vk=vk,
                wk=wk, vis=vis, idx=idx, valid=valid, wk_s=wk_s,
                block_bucket=block_bucket, total=total,
                visited=np.isin(np.arange(NUM_SLABS * G),
                                [c[0] for c in chunks]),
                bands=(ubase, vband, vband_t))


def test_band_shapes(setup):
    ubase, vband, vband_t = setup["bands"]
    assert ubase.shape == (WIN_ROWS, setup["total"])
    assert vband.shape == (setup["total"], LANES)
    assert vband_t.shape == (LANES, setup["total"])
    np.testing.assert_array_equal(np.asarray(vband_t),
                                  np.asarray(vband).T)


def test_grid_packed_matches_numpy_scatter(setup):
    s = setup
    oracle = np.zeros((NUM_K, LANES, LANES), np.complex128)
    for p in range(s["num"]):
        patch = np.outer(s["uk"][p], s["vk"][p])
        for layer in range(SW):
            oracle[s["k0"][p] + layer,
                   s["iu0"][p]:s["iu0"][p] + S,
                   s["iv0"][p]:s["iv0"][p] + S] += \
                s["wk"][p, layer] * s["vis"][p] * patch

    vis_s = s["vis"][s["idx"]]
    scales = np.concatenate([s["wk_s"] * vis_s.real[:, None],
                             s["wk_s"] * vis_s.imag[:, None]], axis=1)
    ubase, vband, _ = s["bands"]
    wins = np.asarray(grid_packed_pallas(
        jnp.asarray(s["block_bucket"]), ubase, vband,
        jnp.asarray(scales.T.copy()), NUM_SLABS * G, LANES, SW,
        block_v=BLOCK, interpret=True))

    # Fold (mirrors parallel.packed): mask unvisited buckets with
    # where (they hold garbage), split window halves, shift octets.
    # Window layout is (layer, re/im)-major: [2*SW, TB, 16, LANES].
    w = np.where(s["visited"][None, :, None, None], wins, 0.0)
    w = w.reshape(2, SW, NUM_SLABS, G, WIN_ROWS, LANES)
    folded = np.zeros((2, NUM_K, LANES, LANES))
    for slab in range(NUM_SLABS):
        for g in range(G):
            for ri in range(2):
                for layer in range(SW):
                    folded[ri, slab + layer, 8 * g:8 * g + 8] += \
                        w[ri, layer, slab, g, :8]
                    if g + 1 < G:
                        folded[ri, slab + layer,
                               8 * (g + 1):8 * (g + 1) + 8] += \
                            w[ri, layer, slab, g, 8:]
                    else:
                        assert np.abs(w[ri, layer, slab, g, 8:]).max() \
                            == 0
    result = folded[0] + 1j * folded[1]
    err = np.abs(result - oracle).max() / np.abs(oracle).max()
    assert err < 2e-6


def test_degrid_fused_matches_numpy_gather(setup):
    """The fused kernel (window tiles streamed straight from the padded
    plane stack by scalar-prefetched index maps) must match the same
    NumPy gather oracle as the windowed kernel."""
    s = setup
    rng = np.random.default_rng(7)
    layers = (rng.standard_normal((NUM_K, LANES, LANES))
              + 1j * rng.standard_normal((NUM_K, LANES, LANES))
              ).astype(np.complex64)
    oracle = np.zeros(s["num"], np.complex128)
    for p in range(s["num"]):
        patch = np.outer(s["uk"][p], s["vk"][p])
        for layer in range(SW):
            oracle[p] += s["wk"][p, layer] * np.sum(
                patch * layers[s["k0"][p] + layer,
                               s["iu0"][p]:s["iu0"][p] + S,
                               s["iv0"][p]:s["iv0"][p] + S])

    planes = np.zeros((2, NUM_K, LANES + 8, LANES), np.float32)
    planes[0, :, :LANES] = layers.real
    planes[1, :, :LANES] = layers.imag
    bb = s["block_bucket"].astype(np.int64)
    p_idx = (bb // G).astype(np.int32)       # slab (T = 1)
    g_idx = (bb % G).astype(np.int32)        # u octet
    hv_idx = np.zeros_like(g_idx)            # full-lane-width window

    ubase, _, vband_t = s["bands"]
    vis_out = np.asarray(degrid_fused_pallas(
        jnp.asarray(planes), jnp.asarray(p_idx), jnp.asarray(g_idx),
        jnp.asarray(hv_idx), ubase, vband_t,
        jnp.asarray(s["wk_s"].T.copy()), SW, block_v=BLOCK,
        interpret=True))
    out = np.zeros(s["num"], np.complex64)
    out[s["idx"][s["valid"]]] = vis_out[s["valid"]]
    err = np.abs(out - oracle).max() / np.abs(oracle).max()
    assert err < 2e-6
