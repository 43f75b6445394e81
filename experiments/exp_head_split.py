"""Headline-scenario stage split + block-size sweep (v3 band engine)."""
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ska_sdp_func_tpu.parallel import plan_wstack
from ska_sdp_func_tpu.parallel.packed import plan_packed, packed_gridder, _GRIDDER_CACHE
from ska_sdp_func_tpu.utility.device import device_put

C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS, CHANS = 16384, 64
rng = np.random.default_rng(1)
uvw = rng.uniform(-1, 1, (ROWS, 3))
uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
vis = (rng.standard_normal((ROWS, CHANS))
       + 1j * rng.standard_normal((ROWS, CHANS))).astype(np.complex64)
plan = plan_wstack(uvw, C_0, C_0 / (100 * CHANS), CHANS, IMAGE, SUBGRID,
                   THETA, W_STEP, support=8, w_support=4, w_tower_height=HEIGHT)
red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
fb = jax.jit(lambda v, s: v * (jnp.float32(1.0) + jnp.float32(1e-6)*jnp.tanh(s)))
nvis = ROWS * CHANS
out = {}
for bv in (256, 512, 1024):
    pplan = plan_packed(plan, uvw, block_v=bv)
    g = packed_gridder(pplan)
    vre0, vim = g.sort(device_put(vis))
    st = {"v": vre0, "img": None}
    st["img"] = g.grid_sorted(st["v"], vim); _ = float(red(st["img"]))
    dts = []
    for _m in range(4):
        t0 = time.perf_counter()
        for _i in range(15):
            st["img"] = g.grid_sorted(st["v"], vim)
            st["v"] = fb(st["v"], red(st["img"]))
        _ = float(red(st["img"]))
        dts.append((time.perf_counter() - t0) / 15)
    r = nvis / sorted(dts[1:])[1] / 1e6
    out[f"grid_bv{bv}"] = round(r, 1)
    out[f"pad_bv{bv}"] = round(pplan.total / nvis, 3)
    out[f"blocks_bv{bv}"] = pplan.num_blocks
    print(f"bv={bv}: {r:.1f} Mvis/s pad={pplan.total/nvis:.3f} blocks={pplan.num_blocks}", flush=True)
    if bv == 512:
        rep = g.report_timing(vre0, vim)
        out["stages_ms"] = {k: round(v*1e3, 2) for k, v in rep.items()}
        m = jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0)
        repd = g.report_timing_degrid(m)
        out["dstages_ms"] = {k: round(v*1e3, 2) for k, v in repd.items()}
    _GRIDDER_CACHE.clear()
print(json.dumps(out))
