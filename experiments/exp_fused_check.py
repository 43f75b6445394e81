"""Scratch parity check: fused kernels vs streamed-band packed kernels.

Run on CPU: JAX_PLATFORMS=cpu python experiments/exp_fused_check.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

# The ambient sitecustomize may re-pin the TPU platform after the env
# assignment above; the config update wins (same trick as tests/conftest).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from ska_sdp_func_tpu.parallel.wstack import plan_wstack
from ska_sdp_func_tpu.parallel.packed import plan_packed, packed_gridder
from ska_sdp_func_tpu.kernels.packed_tap import grid_packed_pallas
from ska_sdp_func_tpu.kernels.fused_tap import (
    grid_fused_pallas, degrid_fused2_pallas, pack_plan_words)
from ska_sdp_func_tpu.grid_data.wtower import _tap_coeffs_cached

rng = np.random.default_rng(7)
num_rows, num_chan = 120, 2
image_size, subgrid = 256, 128

theta, w_step, height = 0.002, 100.0, 4.0
uvw = rng.uniform(-1, 1, (num_rows, 3))
uvw[:, :2] *= 0.45 * image_size / 2 / theta
uvw[:, 2] *= 1.5 * w_step * height
C_0 = 299792458.0
wplan = plan_wstack(
    uvw, freq0_hz=C_0, dfreq_hz=C_0 / (100 * num_chan),
    num_chan=num_chan,
    image_size=image_size, subgrid_size=subgrid, theta=theta,
    w_step=w_step, support=8, oversampling=16384,
    w_support=4, w_oversampling=16384, w_tower_height=height)
print("planning", flush=True)
pplan = plan_packed(wplan, uvw, block_v=128)
print("plan done: total", pplan.total, "blocks", pplan.num_blocks, flush=True)
g = packed_gridder(pplan)

vis = (rng.normal(size=(num_rows, num_chan))
       + 1j * rng.normal(size=(num_rows, num_chan))).astype(np.complex64)
vre, vim = g.sort(jnp.asarray(vis))

arr = pplan.arrays
uv_c = _tap_coeffs_cached(wplan.support, wplan.oversampling)
w_c = _tap_coeffs_cached(wplan.w_support, wplan.w_oversampling)
pa, pb = pack_plan_words(arr["iv0"], arr["u_off"], arr["w_row"],
                         arr["u_frac"], arr["v_frac"], arr["valid"])

# Reference: existing streamed-band kernel
scales = jnp.concatenate([g.wk_t * vre[None, :], g.wk_t * vim[None, :]],
                         axis=0)
print("ref kernel...", flush=True)
wins_ref = grid_packed_pallas(
    g.block_bucket, g.ubase, g.vband, scales, pplan.num_buckets,
    subgrid, wplan.w_support, block_v=pplan.block_v, interpret=True)

print("fused kernel...", flush=True)
wins_fused = grid_fused_pallas(
    g.block_bucket, jnp.asarray(pa), jnp.asarray(pb), vre, vim,
    uv_c, w_c, pplan.num_buckets, subgrid, wplan.support,
    wplan.w_support, wplan.oversampling, wplan.w_oversampling,
    block_v=pplan.block_v, precision="highest", interpret=True)

visited = np.asarray(pplan.arrays["visited"])
mask = np.repeat(visited, 1)
wr = np.asarray(wins_ref)[:, mask]
wf = np.asarray(wins_fused)[:, mask]
scale = np.abs(wr).max()
print("grid windows: max abs diff", np.abs(wr - wf).max(),
      "rel", np.abs(wr - wf).max() / scale)

# Degrid parity: existing fused (band-streamed) vs fused2 (in-kernel)
from ska_sdp_func_tpu.kernels.packed_tap import degrid_fused_pallas

print("degrid setup...", flush=True)
image = rng.normal(size=(image_size, image_size)).astype(np.float32)
st = jax.jit(g._dstage_layers)(
    jax.jit(g._dstage_planes)(jnp.asarray(image)),
    g.ladder_degrid, g.pref_degrid)
p_idx, g_idx, hv_idx = g._degrid_indices()
print("ref degrid...", flush=True)
out_ref = degrid_fused_pallas(
    st, p_idx, g_idx, hv_idx, g.ubase, g.vband_t, g.wk_t,
    wplan.w_support, block_v=pplan.block_v, interpret=True)
print("fused degrid...", flush=True)
out_f = degrid_fused2_pallas(
    st, p_idx, g_idx, hv_idx, jnp.asarray(pa), jnp.asarray(pb),
    uv_c, w_c, subgrid, wplan.support, wplan.w_support,
    wplan.oversampling, wplan.w_oversampling, block_v=pplan.block_v,
    precision="highest", interpret=True)
dr, df = np.asarray(out_ref), np.asarray(out_f)
s2 = np.abs(dr).max()
print("degrid vis: max abs diff", np.abs(dr - df).max(),
      "rel", np.abs(dr - df).max() / s2)
