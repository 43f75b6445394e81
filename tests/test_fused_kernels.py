"""Fused (in-kernel tap evaluation) grid/degrid kernels vs the
streamed-band packed kernels.

The fused kernels are the STREAMING engine; since the round-5 v3
stack-kernel A/B (bands 454.9/202.6 vs fused 375.4/175.7 Mvis/s
whole-image) the plan-once default ``engine="auto"`` routes BOTH
directions through the band kernels, with ``engine="compact"``
(pre-evaluated taps streamed at ~84 B/slot, placement in-kernel) as
the speed-equal low-HBM alternative.  The streaming suite exercises
the fused kernels end-to-end; here the kernels are pinned DIRECTLY
against the band-streaming formulation on the same plan, plus the
word packing round-trip and the "high" (manual bf16-split) accuracy
budget.  The comparison is tolerance-based, not bit-exact: the fused
kernels evaluate the Chebyshev fits via a basis recurrence + one MXU
coefficient dot (round-4 v2 — ~70 VPU lane-ops/entry vs ~800 for the
per-support Clenshaw the band build uses), which agrees with Clenshaw
to a few ulps, not bitwise.

NOTE: the two ``*_matches_band_kernel`` tests below compare the OLD
per-bucket-window kernel forms against each other on identical
operands — since the v3 stack migration the driver no longer produces
those layouts, so the inputs these tests hand the old kernels are
layout-agnostic kernel-parity fixtures, not driver state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ska_sdp_func_tpu.grid_data.wtower import _tap_coeffs_cached
from ska_sdp_func_tpu.kernels.fused_tap import (
    MAX_OVERSAMPLING,
    MAX_W_OVERSAMPLING,
    _unpack_words,
    degrid_fused2_pallas,
    fused_geometry_ok,
    grid_fused_pallas,
    pack_plan_words,
)
from ska_sdp_func_tpu.kernels.packed_tap import (
    degrid_fused_pallas,
    grid_packed_pallas,
)
from ska_sdp_func_tpu.parallel.packed import packed_gridder, plan_packed
from ska_sdp_func_tpu.parallel.wstack import plan_wstack

C_0 = 299792458.0
IMAGE, SUBGRID = 256, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0


def test_pack_plan_words_roundtrip():
    rng = np.random.default_rng(3)
    n = 4096
    iv0 = rng.integers(0, 2048, n).astype(np.int32)
    u_off = rng.integers(0, 8, n).astype(np.int32)
    w_row = rng.integers(0, MAX_W_OVERSAMPLING, n).astype(np.int32)
    u_frac = rng.integers(0, MAX_OVERSAMPLING, n).astype(np.int32)
    v_frac = rng.integers(0, MAX_OVERSAMPLING, n).astype(np.int32)
    valid = rng.integers(0, 2, n).astype(bool)
    pa, pb = pack_plan_words(iv0, u_off, w_row, u_frac, v_frac, valid)
    assert pa.dtype == np.int32 and pb.dtype == np.int32
    assert (pa >= 0).all() and (pb >= 0).all()
    out = jax.jit(_unpack_words)(jnp.asarray(pa), jnp.asarray(pb))
    for got, want in zip(out, (iv0, u_off, w_row, u_frac, v_frac,
                               valid.astype(np.int32))):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_geometry_ok_limits():
    assert fused_geometry_ok(2048, 8, 32768, 131072)
    assert not fused_geometry_ok(4096, 8, 16384, 16384)
    assert not fused_geometry_ok(128, 8, 65536, 16384)
    assert not fused_geometry_ok(128, 8, 16384, 262144)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    num_rows, num_chan = 120, 2
    uvw = rng.uniform(-1, 1, (num_rows, 3))
    uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
    uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
    wplan = plan_wstack(
        uvw, C_0, C_0 / (100 * num_chan), num_chan, IMAGE, SUBGRID,
        THETA, W_STEP, support=8, oversampling=16384, w_support=4,
        w_oversampling=16384, w_tower_height=HEIGHT)
    pplan = plan_packed(wplan, uvw, block_v=128)
    # engine="fused" explicitly: the plan-once default is the band
    # engine (round-5 whole-image A/B); the fused engine is the
    # streaming engine and is what this suite pins.
    g = packed_gridder(pplan, engine="fused")
    assert g._fused
    vis = (rng.standard_normal((num_rows, num_chan))
           + 1j * rng.standard_normal((num_rows, num_chan))
           ).astype(np.complex64)
    vre, vim = g.sort(jnp.asarray(vis))
    uv_c = _tap_coeffs_cached(wplan.support, wplan.oversampling)
    w_c = _tap_coeffs_cached(wplan.w_support, wplan.w_oversampling)
    return dict(wplan=wplan, pplan=pplan, g=g, vre=vre, vim=vim,
                uv_c=uv_c, w_c=w_c)


def _band_operands(s):
    """Build the band-streaming operands the OLD kernels consume (the
    fused gridder no longer holds them)."""
    from ska_sdp_func_tpu.grid_data.kernels import eval_kernel_taps
    from ska_sdp_func_tpu.kernels.packed_tap import build_bands

    wplan, pplan = s["wplan"], s["pplan"]
    arr = pplan.arrays
    valid = jnp.asarray(arr["valid"])

    def f(u_frac, v_frac, w_row, u_off, iv0):
        uk = eval_kernel_taps(u_frac, s["uv_c"], wplan.oversampling)
        vk = eval_kernel_taps(v_frac, s["uv_c"], wplan.oversampling)
        wk = jnp.where(valid[:, None],
                       eval_kernel_taps(w_row, s["w_c"],
                                        wplan.w_oversampling), 0.0)
        ubase, vband, vband_t = build_bands(u_off, iv0, uk, vk,
                                            wplan.subgrid_size)
        return wk.T, ubase, vband, vband_t

    return jax.jit(f)(
        jnp.asarray(arr["u_frac"]), jnp.asarray(arr["v_frac"]),
        jnp.asarray(arr["w_row"]), jnp.asarray(arr["u_off"]),
        jnp.asarray(arr["iv0"]))


@pytest.mark.slow
def test_grid_fused_matches_band_kernel(setup):
    s = setup
    wplan, pplan, g = s["wplan"], s["pplan"], s["g"]
    wk_t, ubase, vband, _ = _band_operands(s)
    scales = jnp.concatenate([wk_t * s["vre"][None, :],
                              wk_t * s["vim"][None, :]], axis=0)
    wins_ref = grid_packed_pallas(
        g.block_bucket, ubase, vband, scales, pplan.num_buckets,
        wplan.subgrid_size, wplan.w_support, block_v=pplan.block_v,
        interpret=True)
    wins = grid_fused_pallas(
        g.block_bucket, g.pa, g.pb, s["vre"], s["vim"], s["uv_c"],
        s["w_c"], pplan.num_buckets, wplan.subgrid_size, wplan.support,
        wplan.w_support, wplan.oversampling, wplan.w_oversampling,
        block_v=pplan.block_v, precision="highest", interpret=True)
    visited = np.asarray(pplan.arrays["visited"])
    wr = np.asarray(wins_ref)[:, visited]
    wf = np.asarray(wins)[:, visited]
    # Basis-form taps agree with the band build's Clenshaw to a few
    # ulps (same fit, different evaluation order) — not bitwise.
    tol = 1e-6 * np.abs(wr).max()
    np.testing.assert_allclose(wf, wr, atol=tol)


@pytest.mark.slow
def test_degrid_fused2_matches_band_kernel(setup):
    s = setup
    wplan, pplan, g = s["wplan"], s["pplan"], s["g"]
    # Sky-like model (point sources): a full-range noise image is
    # amplified ~1e15 by the 1/PSWF border + w-ladder in the plane
    # stack, and few-ulp tap differences between the basis-form and
    # Clenshaw evaluations then read as O(1) relative vis error — the
    # same conditioning caveat as test_packed_fast_mode_accuracy.
    image = np.zeros((IMAGE, IMAGE), np.float32)
    image[IMAGE // 2 + 12, IMAGE // 2 - 9] = 1.0
    image[IMAGE // 2 - 20, IMAGE // 2 + 15] = 0.5
    st = jax.jit(lambda im: g._dstage_layers(
        g._dstage_planes(im), g.ladder_degrid, g.pref_degrid))(
            jnp.asarray(image))
    p_idx, g_idx, hv_idx = g._degrid_indices()
    wk_t, ubase, _, vband_t = _band_operands(s)
    out_ref = degrid_fused_pallas(
        st, p_idx, g_idx, hv_idx, ubase, vband_t, wk_t,
        wplan.w_support, block_v=pplan.block_v, interpret=True)
    out = degrid_fused2_pallas(
        st, p_idx, g_idx, hv_idx, g.pa, g.pb, s["uv_c"], s["w_c"],
        wplan.subgrid_size, wplan.support, wplan.w_support,
        wplan.oversampling, wplan.w_oversampling,
        block_v=pplan.block_v, precision="highest", interpret=True)
    a, b = np.asarray(out), np.asarray(out_ref)
    # See test_grid_fused_matches_band_kernel: few-ulp tap agreement
    # (scaled by the sky-like model's visibility magnitude).
    np.testing.assert_allclose(a, b, atol=1e-5 * np.abs(b).max())


@pytest.mark.slow
def test_grid_fused_high_precision_budget(setup):
    """precision="high" (3-pass bf16-split MXU, f32 accumulate) stays
    within 1e-5 of the HIGHEST-precision windows (the round-4 target:
    f32-accuracy kernels at a fraction of the 6-pass cost)."""
    s = setup
    wplan, pplan, g = s["wplan"], s["pplan"], s["g"]

    def run(precision):
        return grid_fused_pallas(
            g.block_bucket, g.pa, g.pb, s["vre"], s["vim"], s["uv_c"],
            s["w_c"], pplan.num_buckets, wplan.subgrid_size,
            wplan.support, wplan.w_support, wplan.oversampling,
            wplan.w_oversampling, block_v=pplan.block_v,
            precision=precision, interpret=True)

    visited = np.asarray(pplan.arrays["visited"])
    ref = np.asarray(run("highest"))[:, visited]
    high = np.asarray(run("high"))[:, visited]
    peak = np.abs(ref).max()
    assert np.abs(high - ref).max() <= 1e-5 * peak


@pytest.mark.parametrize("direction", ["grid", "degrid"])
def test_compact_engine_matches_bands(direction):
    """engine='compact' (taps streamed, placement in-kernel) must
    match the band engine to f32 tolerance on both directions."""
    from ska_sdp_func_tpu.parallel import plan_wstack
    from ska_sdp_func_tpu.parallel.packed import (packed_gridder,
                                                  plan_packed)

    C_0 = 299792458.0
    rng = np.random.default_rng(11)
    rows, chans, image, subgrid = 400, 3, 256, 128
    uvw = rng.uniform(-1, 1, (rows, 3))
    uvw[:, :2] *= 0.4 * image / 2 / 0.002
    uvw[:, 2] *= 1.2 * 100.0 * 4.0
    vis = (rng.standard_normal((rows, chans))
           + 1j * rng.standard_normal((rows, chans))
           ).astype(np.complex64)
    plan = plan_wstack(uvw, C_0, C_0 / 300, chans, image, subgrid,
                       0.002, 100.0, support=8, w_support=4,
                       w_tower_height=4.0)
    pplan = plan_packed(plan, uvw, block_v=128)
    gb = packed_gridder(pplan, engine="bands", precision="highest")
    gc = packed_gridder(pplan, engine="compact", precision="highest")
    assert gc._compact
    if direction == "grid":
        a = np.asarray(gb.grid(jnp.asarray(vis)))
        b = np.asarray(gc.grid(jnp.asarray(vis)))
        # compare interiors; the 1/PSWF border diverges on both paths
        m = 16
        a, b = a[m:-m, m:-m], b[m:-m, m:-m]
        scale = np.abs(a).max()
    else:
        model = jnp.zeros((image, image), jnp.float32)             .at[150, 100].set(1.0)
        a = np.asarray(gb.degrid_sorted(model))
        b = np.asarray(gc.degrid_sorted(model))
        scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 2e-6


def test_split_bf16_lo_half_survives_compilation():
    """Regression guard for the excess-precision hazard: the naive
    ``x - f32(bf16(x))`` split is folded to zero by XLA under
    --xla_allow_excess_precision (and by LLVM on CPU), silently
    degrading precision='high' to bf16-class 1e-3 error. The
    bit-level split_bf16 must keep a non-trivial lo half and
    reconstruct to ~2^-17 under jit on ANY backend."""
    from ska_sdp_func_tpu.kernels.packed_tap import split_bf16

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
    hi, lo = jax.jit(split_bf16)(x)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    lo_f = np.asarray(lo.astype(jnp.float32))
    assert np.abs(lo_f).max() > 0.0, "lo half collapsed to zero"
    rec = np.asarray(hi.astype(jnp.float32)) + lo_f
    rel = np.abs(rec - np.asarray(x)).max() / np.abs(x).max()
    assert rel < 1e-4, f"hi+lo reconstruction error {rel:.2e}"
