"""On-chip A/B: v3 stack-accumulating fused grid vs band engine.

Measures whole-image grid rate on the bench headline (512^2, 1M vis)
and dense (4.2M vis) scenarios for engine in {fused(v3), bands}, plus
the fused stage split. Chained-loop + readback timing (PERFORMANCE.md).
"""
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ska_sdp_func_tpu.parallel import plan_wstack
from ska_sdp_func_tpu.parallel.packed import plan_packed, packed_gridder
from ska_sdp_func_tpu.utility.device import device_put

C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS = 16384

rng = np.random.default_rng(1)
uvw = rng.uniform(-1, 1, (ROWS, 3))
uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
fb = jax.jit(lambda v, s: v * (jnp.float32(1.0) + jnp.float32(1e-6) * jnp.tanh(s)))

def measure(g, vre0, vim, nvis, iters=15, n=3):
    img = g.grid_sorted(vre0, vim); _ = float(red(img))
    st = {"v": vre0, "img": img}
    dts = []
    for _m in range(n + 1):
        t0 = time.perf_counter()
        for _i in range(iters):
            st["img"] = g.grid_sorted(st["v"], vim)
            st["v"] = fb(st["v"], red(st["img"]))
        _ = float(red(st["img"]))
        dts.append((time.perf_counter() - t0) / iters)
    dts = sorted(dts[1:])
    return nvis / dts[len(dts)//2] / 1e6

out = {}
for tag, chans in (("head", 64), ("dense", 256)):
    vis = (rng.standard_normal((ROWS, chans))
           + 1j * rng.standard_normal((ROWS, chans))).astype(np.complex64)
    plan = plan_wstack(uvw, C_0, C_0 / (100 * chans), chans, IMAGE,
                       SUBGRID, THETA, W_STEP, support=8, w_support=4,
                       w_tower_height=HEIGHT)
    pplan = plan_packed(plan, uvw)
    nvis = ROWS * chans
    for engine in ("fused", "bands"):
        g = packed_gridder(pplan, engine=engine)
        vre0, vim = g.sort(device_put(vis))
        r = measure(g, vre0, vim, nvis)
        out[f"{tag}_{engine}"] = round(r, 1)
        print(f"{tag} {engine}: {r:.1f} Mvis/s", flush=True)
    if tag == "head":
        g = packed_gridder(pplan, engine="fused")
        vre0, vim = g.sort(device_put(vis))
        rep = g.report_timing(vre0, vim)
        out["head_stages_ms"] = {k: round(v*1e3, 2) for k, v in rep.items()}
print(json.dumps(out))
