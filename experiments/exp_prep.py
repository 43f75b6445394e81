"""Prep-kernel variant sweep: which stage makes stream-prep ~20x its
bandwidth roofline? (measured 112 ms for ~600 KB/step of output at
granule 1024 — expect ~10 ms).

Variants (each a pallas kernel over the same [cap] operands):
  full    - current stream_prep_grid_pallas
  novband - ubase + scales only (vband written as constant)
  vbonly  - vband only (ubase/scales constant)
  vbnochb - vband only, taps = raw fraction (no Clenshaw)
  ubonly  - ubase only
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import wait_for_chip  # noqa: E402
from ska_sdp_func_tpu.kernels.packed_tap import (  # noqa: E402
    PREP_G,
    WIN_ROWS,
    _VMEM_LIMIT,
    _clenshaw_cols,
    _clenshaw_rows,
    stream_prep_grid_pallas,
)
from ska_sdp_func_tpu.grid_data.wtower import _tap_coeffs_cached  # noqa

wait_for_chip()
CAP = 5_872_640 // PREP_G * PREP_G
LANES, S, SW = 128, 8, 4
OV = WOV = 16 * 1024
rng = np.random.default_rng(3)
u_off = jnp.asarray(rng.integers(0, 8, CAP).astype(np.int32))
u_frac = jnp.asarray(rng.integers(0, OV, CAP).astype(np.int32))
v_frac = jnp.asarray(rng.integers(0, OV, CAP).astype(np.int32))
w_row = jnp.asarray(rng.integers(0, WOV, CAP).astype(np.int32))
iv0 = jnp.asarray(rng.integers(0, 120, CAP).astype(np.int32))
vre = jnp.asarray(rng.standard_normal(CAP).astype(np.float32))
vim = jnp.asarray(rng.standard_normal(CAP).astype(np.float32))
c_uv = np.asarray(_tap_coeffs_cached(S, OV), np.float32)
c_w = np.asarray(_tap_coeffs_cached(SW, WOV), np.float32)

red = jax.jit(lambda a, b, c: jnp.sum(jnp.abs(a[:, :4096]))
              + jnp.sum(jnp.abs(b[:4096].astype(jnp.float32)))
              + jnp.sum(jnp.abs(c[:, :4096])))
fbi = jax.jit(lambda x, s: x + (s > -1.0).astype(jnp.int32) * 0)


def timeit(name, fn, n=10):
    out = fn(u_frac)
    _ = float(red(*out))
    uf = u_frac
    for _loop in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(uf)
            uf = fbi(uf, red(*out))
        _ = float(red(*out))
        dt = (time.perf_counter() - t0) / n
    print(f"{name:8s}: {dt * 1e3:7.2f} ms", flush=True)


def variant(mode):
    def kern(c_uv_ref, c_w_ref, uo_ref, uf_ref, wr_ref, vre_ref,
             vim_ref, iv0c_ref, vfc_ref, ub_ref, vb_ref, sc_ref):
        g = PREP_G
        cu, cw = c_uv_ref[:], c_w_ref[:]
        if mode in ("full", "novband", "ubonly"):
            xu = np.float32(2.0 / OV) * uf_ref[:].astype(jnp.float32) - 1.0
            uk = _clenshaw_rows(xu, cu)
            row16 = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, g), 0)
            uo = uo_ref[:]
            ub = jnp.zeros((WIN_ROWS, g), jnp.float32)
            for s in range(S):
                ub = jnp.where(row16 == uo + s, uk[s], ub)
            ub_ref[:] = ub
        else:
            ub_ref[:] = jnp.zeros((WIN_ROWS, g), jnp.float32)
        if mode in ("full", "novband"):
            xw = np.float32(2.0 / WOV) * wr_ref[:].astype(jnp.float32) - 1.0
            wk = _clenshaw_rows(xw, cw)
            sc_ref[:] = jnp.concatenate(
                [wk * vre_ref[:], wk * vim_ref[:]], axis=0)
        else:
            sc_ref[:] = jnp.zeros((2 * SW, g), jnp.float32)
        if mode in ("full", "vbonly", "vbnochb"):
            iv = iv0c_ref[:]
            if mode == "vbnochb":
                vk = (vfc_ref[:].astype(jnp.float32)
                      * jnp.ones((1, S), jnp.float32))
            else:
                xv = np.float32(2.0 / OV) * vfc_ref[:].astype(
                    jnp.float32) - 1.0
                vk = _clenshaw_cols(xv, cu)
            col = jax.lax.broadcasted_iota(jnp.int32, (PREP_G, LANES), 1)
            vb = jnp.zeros((PREP_G, LANES), jnp.float32)
            for s in range(S):
                vb = jnp.where(col == iv + s, vk[:, s:s + 1], vb)
            vb_ref[:] = vb
        else:
            vb_ref[:] = jnp.zeros((PREP_G, LANES), jnp.float32)

    g = PREP_G
    num_g = CAP // g
    cspec = lambda c: pl.BlockSpec(c.shape, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(num_g,),
            in_specs=[cspec(c_uv), cspec(c_w)] + [
                pl.BlockSpec((g,), lambda b: (b,),
                             memory_space=pltpu.VMEM)] * 5 + [
                pl.BlockSpec((g, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)] * 2,
            out_specs=[
                pl.BlockSpec((WIN_ROWS, g), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, LANES), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * SW, g), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((WIN_ROWS, CAP), jnp.float32),
            jax.ShapeDtypeStruct((CAP, LANES), jnp.float32),
            jax.ShapeDtypeStruct((2 * SW, CAP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT))

    @jax.jit
    def fn(uf):
        return call(c_uv, c_w, u_off, uf, w_row, vre, vim,
                    iv0.reshape(CAP, 1), v_frac.reshape(CAP, 1))
    return fn


for mode in ("ubonly", "novband", "vbnochb", "vbonly", "full"):
    timeit(mode, variant(mode))
