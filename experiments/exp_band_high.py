"""Band stack kernels at precision='high' (pre-split bf16 hi/lo bands,
three single-pass dots) vs 'highest' (native-f32 multi-pass).
RTT-amortised (iters>=100). Also taper-weighted accuracy."""
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
ROWS = 16384
rng = np.random.default_rng(1)
uvw = rng.uniform(-1, 1, (ROWS, 3))
uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
redc = jax.jit(lambda x: jnp.sum(jnp.abs(x.real)) + jnp.sum(jnp.abs(x.imag)))
fb = jax.jit(lambda v, s: v * (jnp.float32(1.0) + jnp.float32(1e-6)*jnp.tanh(s)))
fbi = jax.jit(lambda m, s: m + jnp.float32(1e-6)*jnp.tanh(s))
out = {}
for tag, chans, iters in (("head", 64, 150), ("dense", 256, 60)):
    vis = (rng.standard_normal((ROWS, chans))
           + 1j * rng.standard_normal((ROWS, chans))).astype(np.complex64)
    plan = plan_wstack(uvw, C_0, C_0/(100*chans), chans, IMAGE, SUBGRID,
                       THETA, W_STEP, support=8, w_support=4, w_tower_height=HEIGHT)
    pplan = plan_packed(plan, uvw)
    nvis = ROWS * chans
    imgs = {}
    for prec in ("highest", "high"):
        g = packed_gridder(pplan, precision=prec)
        vre0, vim = g.sort(device_put(vis))
        st = {"v": vre0, "img": None}
        st["img"] = g.grid_sorted(st["v"], vim); _ = float(red(st["img"]))
        dts = []
        for _m in range(3):
            t0 = time.perf_counter()
            for _i in range(iters):
                st["img"] = g.grid_sorted(st["v"], vim)
                st["v"] = fb(st["v"], red(st["img"]))
            _ = float(red(st["img"]))
            dts.append((time.perf_counter()-t0)/iters)
        r = nvis/sorted(dts[1:])[0]/1e6
        out[f"{tag}_grid_{prec}"] = round(r, 1)
        print(f"{tag} grid {prec}: {r:.1f} Mvis/s", flush=True)
        imgs[prec] = np.asarray(g.grid_sorted(vre0, vim))
        # degrid
        m = jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0)
        vs = g.degrid_sorted(m); _ = float(redc(vs))
        ds = {"m": m, "s": None}
        dts = []
        for _m2 in range(3):
            t0 = time.perf_counter()
            for _i in range(iters):
                vs = g.degrid_sorted(ds["m"])
                ds["s"] = redc(vs)
                ds["m"] = fbi(ds["m"], ds["s"])
            _ = float(ds["s"])
            dts.append((time.perf_counter()-t0)/iters)
        r = nvis/sorted(dts[1:])[0]/1e6
        out[f"{tag}_degrid_{prec}"] = round(r, 1)
        print(f"{tag} degrid {prec}: {r:.1f} Mvis/s", flush=True)
        _GRIDDER_CACHE.clear()
    if tag == "head":
        # taper-weighted accuracy of high vs highest
        from ska_sdp_func_tpu.grid_data.grid_correct import _pswf_correction_host
        k = plan.kernel()
        taper = 1.0 / _pswf_correction_host(
            k.image_size, k.theta, k.w_step, k.shear_u, k.shear_v,
            k.support, k.w_support, k.image_size, k.image_size, 0, 0)
        d = np.abs((imgs["high"] - imgs["highest"]) * taper)
        pk = np.abs(imgs["highest"] * taper).max()
        out["taper_err"] = float(d.max() / pk)
        print(f"taper-weighted high-vs-highest err: {d.max()/pk:.2e}", flush=True)
print(json.dumps(out))
