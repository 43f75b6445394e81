"""On-chip A/B round 2: v3 stack kernels both directions.

Grid + degrid whole-image rates on the bench headline (1M vis) and
dense (4.2M) scenarios, engines bands vs fused (all v3 stack forms).
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
redc = jax.jit(lambda x: jnp.sum(jnp.abs(x.real) + jnp.abs(x.imag)))
fb = jax.jit(lambda v, s: v * (jnp.float32(1.0) + jnp.float32(1e-6) * jnp.tanh(s)))
fbi = jax.jit(lambda m, s: m + jnp.float32(1e-6) * jnp.tanh(s))

def med(fn, iters=15, n=3):
    dts = []
    for _m in range(n + 1):
        t0 = time.perf_counter()
        fn(iters)
        dts.append((time.perf_counter() - t0) / iters)
    dts = sorted(dts[1:])
    return dts[len(dts)//2]

out = {}
for tag, chans in (("head", 64), ("dense", 256)):
    vis = (rng.standard_normal((ROWS, chans))
           + 1j * rng.standard_normal((ROWS, chans))).astype(np.complex64)
    plan = plan_wstack(uvw, C_0, C_0 / (100 * chans), chans, IMAGE,
                       SUBGRID, THETA, W_STEP, support=8, w_support=4,
                       w_tower_height=HEIGHT)
    pplan = plan_packed(plan, uvw)
    nvis = ROWS * chans
    for engine in ("bands", "fused"):
        g = packed_gridder(pplan, engine=engine)
        vre0, vim = g.sort(device_put(vis))
        st = {"v": vre0, "img": None, "m": jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0), "s": None}
        st["img"] = g.grid_sorted(st["v"], vim); _ = float(red(st["img"]))
        def gloop(iters):
            for _ in range(iters):
                st["img"] = g.grid_sorted(st["v"], vim)
                st["v"] = fb(st["v"], red(st["img"]))
            _ = float(red(st["img"]))
        r = nvis / med(gloop) / 1e6
        out[f"{tag}_grid_{engine}"] = round(r, 1)
        print(f"{tag} grid {engine}: {r:.1f}", flush=True)
        vs = g.degrid_sorted(st["m"]); _ = float(redc(vs))
        def dloop(iters):
            for _ in range(iters):
                vs = g.degrid_sorted(st["m"])
                st["s"] = redc(vs)
                st["m"] = fbi(st["m"], st["s"])
            _ = float(st["s"])
        r = nvis / med(dloop) / 1e6
        out[f"{tag}_degrid_{engine}"] = round(r, 1)
        print(f"{tag} degrid {engine}: {r:.1f}", flush=True)
        del g
    from ska_sdp_func_tpu.parallel.packed import _GRIDDER_CACHE
    _GRIDDER_CACHE.clear()
print(json.dumps(out))
