"""Expected-failure sweep across the public APIs.

The reference systematically asserts failure paths (wrong dtype /
ndim / shape / read-only; tests/fourier_transforms/test_fft.cpp:25-40,
202 and every test_*.cpp); this file mirrors that discipline for the
TPU framework's typed exception family (utility/errors.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ska_sdp_func_tpu.utility.errors import (
    SdpDataTypeError,
    SdpInvalidArgumentError,
    SdpShapeError,
)

C_0 = 299792458.0


# ---------------------------------------------------------------------------
# FFT
# ---------------------------------------------------------------------------

def test_fft_rejects_real_template():
    from ska_sdp_func_tpu.fourier_transforms import Fft

    with pytest.raises(SdpDataTypeError):
        Fft(jnp.zeros((8, 8), jnp.float64), 2, True)


def test_fft_exec_rejects_mismatched_shape():
    from ska_sdp_func_tpu.fourier_transforms import Fft

    plan = Fft(jnp.zeros((8, 8), jnp.complex128), 2, True)
    with pytest.raises(SdpInvalidArgumentError):
        plan.exec(jnp.zeros((4, 4), jnp.complex128))


def test_fft_shifted_rejects_real_input():
    from ska_sdp_func_tpu.fourier_transforms.fft import fft_shifted

    with pytest.raises(SdpDataTypeError):
        fft_shifted(jnp.zeros((8, 8), jnp.float64))


def test_ifft_shifted_rejects_real_input():
    from ska_sdp_func_tpu.fourier_transforms.fft import ifft_shifted

    with pytest.raises(SdpDataTypeError):
        ifft_shifted(jnp.zeros((8, 8), jnp.float32))


# ---------------------------------------------------------------------------
# Data-model checks
# ---------------------------------------------------------------------------

def test_check_uvw_wrong_ndim():
    from ska_sdp_func_tpu.utility.data_model import check_uvw

    with pytest.raises(SdpShapeError):
        check_uvw(jnp.zeros((5, 3)))          # needs [time, baseline, 3]


def test_check_uvw_wrong_last_dim():
    from ska_sdp_func_tpu.utility.data_model import check_uvw

    with pytest.raises(SdpShapeError):
        check_uvw(jnp.zeros((2, 5, 4)))


def test_check_uvw_integer_dtype():
    from ska_sdp_func_tpu.utility.data_model import check_uvw

    with pytest.raises(SdpDataTypeError):
        check_uvw(jnp.zeros((2, 5, 3), jnp.int32))


def test_check_vis_real_dtype():
    from ska_sdp_func_tpu.utility.data_model import check_vis

    with pytest.raises(SdpDataTypeError):
        check_vis(jnp.zeros((2, 5, 3, 1), jnp.float64))


def test_check_vis_bad_pols():
    from ska_sdp_func_tpu.utility.data_model import check_vis

    with pytest.raises(SdpShapeError):
        check_vis(jnp.zeros((2, 5, 3, 3), jnp.complex128))


def test_check_weights_shape_mismatch():
    from ska_sdp_func_tpu.utility.data_model import (
        check_vis,
        check_weights,
    )

    vis = jnp.zeros((2, 5, 3, 1), jnp.complex128)
    check_vis(vis)
    with pytest.raises(SdpShapeError):
        check_weights(jnp.zeros((2, 5, 2, 1)), vis)


# ---------------------------------------------------------------------------
# W-towers gridder
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wtower_kernel():
    from ska_sdp_func_tpu.grid_data import GridderWtowerUVW

    return GridderWtowerUVW(64, 32, 0.002, 100.0, 0, 0, 8, 16384, 4,
                            16384)


def test_wtower_odd_subgrid_rejected():
    from ska_sdp_func_tpu.grid_data import GridderWtowerUVW

    with pytest.raises(SdpInvalidArgumentError):
        GridderWtowerUVW(64, 31, 0.002, 100.0, 0, 0, 8, 16384, 4, 16384)


def test_wtower_grid_inconsistent_channels(wtower_kernel):
    vis = jnp.zeros((4, 2), jnp.complex128)
    uvw = jnp.zeros((4, 3))
    chs = jnp.zeros((4,), jnp.int32)
    sub = jnp.zeros((32, 32), jnp.complex128)
    with pytest.raises(SdpInvalidArgumentError):
        wtower_kernel.grid_subgrid(vis, uvw, chs, chs + 2, 3, C_0, 1e6,
                                   sub, (0, 0, 0))


def test_wtower_grid_bad_uvw_shape(wtower_kernel):
    vis = jnp.zeros((4, 2), jnp.complex128)
    uvw = jnp.zeros((4, 2))                   # last dim must be 3
    chs = jnp.zeros((4,), jnp.int32)
    sub = jnp.zeros((32, 32), jnp.complex128)
    with pytest.raises(SdpShapeError):
        wtower_kernel.grid_subgrid(vis, uvw, chs, chs + 2, 2, C_0, 1e6,
                                   sub, (0, 0, 0))


def test_wtower_grid_integer_uvw(wtower_kernel):
    vis = jnp.zeros((4, 2), jnp.complex128)
    uvw = jnp.zeros((4, 3), jnp.int32)
    chs = jnp.zeros((4,), jnp.int32)
    sub = jnp.zeros((32, 32), jnp.complex128)
    with pytest.raises(SdpDataTypeError):
        wtower_kernel.grid_subgrid(vis, uvw, chs, chs + 2, 2, C_0, 1e6,
                                   sub, (0, 0, 0))


def test_wtower_grid_real_vis(wtower_kernel):
    vis = jnp.zeros((4, 2), jnp.float64)
    uvw = jnp.zeros((4, 3))
    chs = jnp.zeros((4,), jnp.int32)
    sub = jnp.zeros((32, 32), jnp.complex128)
    with pytest.raises(SdpDataTypeError):
        wtower_kernel.grid_subgrid(vis, uvw, chs, chs + 2, 2, C_0, 1e6,
                                   sub, (0, 0, 0))


def test_wtower_grid_wrong_subgrid_shape(wtower_kernel):
    vis = jnp.zeros((4, 2), jnp.complex128)
    uvw = jnp.zeros((4, 3))
    chs = jnp.zeros((4,), jnp.int32)
    sub = jnp.zeros((16, 16), jnp.complex128)
    with pytest.raises(SdpShapeError):
        wtower_kernel.grid_subgrid(vis, uvw, chs, chs + 2, 2, C_0, 1e6,
                                   sub, (0, 0, 0))


def test_wtower_degrid_wrong_subgrid_shape(wtower_kernel):
    uvw = jnp.zeros((4, 3))
    chs = jnp.zeros((4,), jnp.int32)
    sub = jnp.zeros((16, 16), jnp.complex128)
    with pytest.raises(SdpShapeError):
        wtower_kernel.degrid_subgrid(sub, (0, 0, 0), 2, C_0, 1e6, uvw,
                                     chs, chs + 2)


# ---------------------------------------------------------------------------
# Visibility functions
# ---------------------------------------------------------------------------

def test_dft_v00_bad_uvw_rank():
    from ska_sdp_func_tpu.visibility import dft_point_v00

    with pytest.raises(SdpShapeError):
        dft_point_v00(jnp.zeros((2, 3)), jnp.zeros((2, 4, 1),
                                                   jnp.complex128),
                      jnp.zeros((2, 5, 3)))   # needs 4-D uvw


def test_dft_v00_bad_pols():
    from ska_sdp_func_tpu.visibility import dft_point_v00

    with pytest.raises(SdpShapeError):
        dft_point_v00(jnp.zeros((2, 3)),
                      jnp.zeros((2, 4, 3), jnp.complex128),
                      jnp.zeros((2, 5, 4, 3)))


def test_flagger_bad_rank():
    from ska_sdp_func_tpu.visibility import flagger_dynamic_threshold

    with pytest.raises(SdpShapeError):
        flagger_dynamic_threshold(jnp.zeros((4, 8), jnp.complex128))


def test_flagger_real_vis():
    from ska_sdp_func_tpu.visibility import flagger_dynamic_threshold

    with pytest.raises(SdpDataTypeError):
        flagger_dynamic_threshold(jnp.zeros((4, 2, 8, 1), jnp.float64))


def test_weighting_bad_uvw():
    from ska_sdp_func_tpu.visibility import briggs_weights

    with pytest.raises(SdpShapeError):
        briggs_weights(jnp.zeros((4, 3)), jnp.asarray([1e9]), 100.0,
                       0.5, jnp.zeros((4, 1, 1, 1)), 16)


# ---------------------------------------------------------------------------
# CLEAN
# ---------------------------------------------------------------------------

def test_hogbom_rejects_1d_dirty():
    from ska_sdp_func_tpu.clean import hogbom_clean

    with pytest.raises(SdpShapeError):
        hogbom_clean(jnp.zeros((16,)), jnp.zeros((32, 32)),
                     (2.0, 2.0, 1.0, 16.0), 0.1, 1e-3, 10)


def test_hogbom_rejects_small_psf():
    from ska_sdp_func_tpu.clean import hogbom_clean

    with pytest.raises(SdpShapeError):
        hogbom_clean(jnp.zeros((16, 16)), jnp.zeros((16, 16)),
                     (2.0, 2.0, 1.0, 16.0), 0.1, 1e-3, 10)


def test_ms_clean_rejects_small_psf():
    from ska_sdp_func_tpu.clean import ms_clean_cornwell

    with pytest.raises(SdpShapeError):
        ms_clean_cornwell(jnp.zeros((16, 16)), jnp.zeros((16, 16)),
                          (2.0, 2.0, 1.0, 16.0), (0, 2), 0.1, 1e-3, 10)


# ---------------------------------------------------------------------------
# Station beam / custom degridder / SwiFTly / kernels
# ---------------------------------------------------------------------------

def test_station_beam_real_weights():
    from ska_sdp_func_tpu.station_beam import aperture_array

    with pytest.raises(SdpDataTypeError):
        aperture_array(1.0, jnp.zeros((4,), jnp.float64),
                       jnp.zeros((4,)), jnp.zeros((4,)), jnp.zeros((4,)),
                       jnp.zeros((8,)), jnp.zeros((8,)), jnp.zeros((8,)))


def test_custom_degrid_bad_grid_rank():
    from ska_sdp_func_tpu.grid_data import degrid_uvw_custom

    with pytest.raises(SdpShapeError):
        degrid_uvw_custom(jnp.zeros((8, 8), jnp.complex128),
                          jnp.zeros((2, 4, 3)),
                          jnp.zeros((2, 4)), jnp.zeros((2, 4)),
                          1.0, 1.0, 1e9, 1e6)


def test_swiftly_invalid_configuration():
    from ska_sdp_func_tpu.fourier_transforms import Swiftly

    with pytest.raises(SdpInvalidArgumentError):
        Swiftly(1024, 512, 100, 13.5625)     # xM must divide N evenly


def test_swiftly_facet_too_large():
    from ska_sdp_func_tpu.fourier_transforms import Swiftly

    sw = Swiftly(1024, 512, 256, 13.5625)
    with pytest.raises(SdpShapeError):
        sw.prepare_facet(jnp.zeros((600,), jnp.complex128), 0)


def test_make_kernel_rejects_2d_window():
    from ska_sdp_func_tpu.grid_data.kernels import make_kernel

    with pytest.raises(SdpInvalidArgumentError):
        make_kernel(np.zeros((4, 4)), 64)


# ---------------------------------------------------------------------------
# Drivers / plans
# ---------------------------------------------------------------------------

def _tiny_plan(subgrid_frac=2.0 / 3.0, subgrid_size=32):
    from ska_sdp_func_tpu.parallel import plan_wstack

    rng = np.random.default_rng(0)
    uvw = rng.uniform(-1, 1, (20, 3))
    uvw[:, :2] *= 0.3 * 64 / 2 / 0.002
    return plan_wstack(uvw, C_0, C_0 / 100, 2, 64, subgrid_size, 0.002,
                       100.0, subgrid_frac=subgrid_frac), uvw


def test_plan_bucketed_rejects_oversize_frac():
    from ska_sdp_func_tpu.parallel.bucketed import plan_bucketed

    plan, uvw = _tiny_plan(subgrid_frac=0.9)
    with pytest.raises(SdpInvalidArgumentError):
        plan_bucketed(plan, uvw)


def test_plan_packed_rejects_oversize_frac():
    from ska_sdp_func_tpu.parallel.packed import plan_packed

    plan, uvw = _tiny_plan(subgrid_frac=0.99, subgrid_size=128)
    with pytest.raises(SdpInvalidArgumentError):
        plan_packed(plan, uvw)


def test_plan_packed_rejects_unaligned_subgrid():
    from ska_sdp_func_tpu.parallel.packed import plan_packed

    plan, uvw = _tiny_plan(subgrid_size=32)
    with pytest.raises(SdpInvalidArgumentError):
        plan_packed(plan, uvw)


def test_plan_packed_rejects_wide_support():
    from ska_sdp_func_tpu.parallel import plan_wstack
    from ska_sdp_func_tpu.parallel.packed import plan_packed

    rng = np.random.default_rng(0)
    uvw = rng.uniform(-1, 1, (20, 3))
    uvw[:, :2] *= 0.3 * 64 / 2 / 0.002
    plan = plan_wstack(uvw, C_0, C_0 / 100, 2, 64, 128, 0.002, 100.0,
                       support=10)
    with pytest.raises(SdpInvalidArgumentError):
        plan_packed(plan, uvw)


def test_plan_packed_rejects_tall_w_support():
    from ska_sdp_func_tpu.parallel import plan_wstack
    from ska_sdp_func_tpu.parallel.packed import plan_packed

    rng = np.random.default_rng(0)
    uvw = rng.uniform(-1, 1, (20, 3))
    uvw[:, :2] *= 0.3 * 64 / 2 / 0.002
    plan = plan_wstack(uvw, C_0, C_0 / 100, 2, 64, 128, 0.002, 100.0,
                       w_support=6)
    with pytest.raises(SdpInvalidArgumentError):
        plan_packed(plan, uvw)


def test_wstack_grid_all_requires_image_template():
    from ska_sdp_func_tpu.grid_data.wstack import wstack_wtower_grid_all

    rng = np.random.default_rng(0)
    uvw = rng.uniform(-1, 1, (20, 3))
    vis = jnp.asarray(rng.standard_normal((20, 2))
                      + 1j * rng.standard_normal((20, 2)))
    with pytest.raises(SdpInvalidArgumentError):
        wstack_wtower_grid_all(
            vis, C_0, C_0 / 100, jnp.asarray(uvw), 32, 0.002, 100.0,
            0.0, 0.0, 8, 16384, 4, 16384, 2.0 / 3.0, 4.0)
