"""Block-size experiment on the real chip: dense 4.2M-vis stream,
grid + degrid at block_v in (256, 512).  Chained timing with readback
(PERFORMANCE.md methodology)."""
import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS, CHANS = 16384, 256

from ska_sdp_func_tpu.parallel import plan_wstack
from ska_sdp_func_tpu.parallel.packed import packed_gridder, plan_packed
from ska_sdp_func_tpu.utility.device import device_put

rng = np.random.default_rng(1)
uvw = rng.uniform(-1, 1, (ROWS, 3))
uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
freq0 = C_0
vis = (rng.standard_normal((ROWS, CHANS))
       + 1j * rng.standard_normal((ROWS, CHANS))).astype(np.complex64)
nvis = ROWS * CHANS
plan = plan_wstack(uvw, freq0, C_0 / (100 * CHANS), CHANS, IMAGE,
                   SUBGRID, THETA, W_STEP, support=8, w_support=4,
                   w_tower_height=HEIGHT)
red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
redc = jax.jit(lambda x: jnp.sum(jnp.abs(x.real) + jnp.abs(x.imag)))
fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                               + jnp.float32(1e-6) * jnp.tanh(s)))
fbi = jax.jit(lambda m, s: m + jnp.float32(1e-6) * jnp.tanh(s))

visd = device_put(vis)
model0 = jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0)
for bv in (256, 512):
    pplan = plan_packed(plan, uvw, block_v=bv)
    g = packed_gridder(pplan)
    vre, vim = g.sort(visd)
    img = g.grid_sorted(vre, vim)
    _ = float(red(img))
    for _loop in range(2):
        t0 = time.perf_counter()
        for _i in range(10):
            img = g.grid_sorted(vre, vim)
            vre = fb(vre, red(img))
        _ = float(red(img))
        dt = (time.perf_counter() - t0) / 10
    gr = nvis / dt / 1e6
    model = model0
    vs = g.degrid_sorted(model)
    _ = float(redc(vs))
    for _loop in range(2):
        t0 = time.perf_counter()
        for _i in range(10):
            vs = g.degrid_sorted(model)
            model = fbi(model, redc(vs))
        _ = float(redc(vs))
        ddt = (time.perf_counter() - t0) / 10
    dg = nvis / ddt / 1e6
    print(f"block {bv}: stream {pplan.total} "
          f"({pplan.total/nvis:.2f}x pad)  grid {gr:.1f} Mvis/s "
          f"({dt*1e3:.2f} ms)  degrid {dg:.1f} Mvis/s ({ddt*1e3:.2f} ms)",
          flush=True)
