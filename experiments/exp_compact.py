"""On-chip: compact-stream grid kernel (placement-only, 92 B/slot)
vs band (600 B/slot) and fused (16 B/slot), head + dense scenarios.
Kernel+stack-only rates (no drain/planes) plus interpret parity."""
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ska_sdp_func_tpu.parallel import plan_wstack
from ska_sdp_func_tpu.parallel.packed import plan_packed, packed_gridder, _GRIDDER_CACHE
from ska_sdp_func_tpu.kernels.fused_tap import grid_compact_pallas, pack_plan_words
from ska_sdp_func_tpu.utility.device import device_put

C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS = 16384
rng = np.random.default_rng(1)
uvw = rng.uniform(-1, 1, (ROWS, 3))
uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
fb = jax.jit(lambda v, s: v * (jnp.float32(1.0) + jnp.float32(1e-6)*jnp.tanh(s)))
out = {}
for tag, chans in (("head", 64), ("dense", 256)):
    vis = (rng.standard_normal((ROWS, chans))
           + 1j * rng.standard_normal((ROWS, chans))).astype(np.complex64)
    plan = plan_wstack(uvw, C_0, C_0/(100*chans), chans, IMAGE, SUBGRID,
                       THETA, W_STEP, support=8, w_support=4, w_tower_height=HEIGHT)
    pplan = plan_packed(plan, uvw)
    nvis = ROWS * chans
    wp = pplan.wplan
    arrays = pplan.arrays
    g = packed_gridder(pplan)            # bands
    vre0, vim = g.sort(device_put(vis))
    pa, _pb = pack_plan_words(arrays["iv0"].astype(np.int32),
                              arrays["u_off"].astype(np.int32),
                              arrays["w_row"].astype(np.int32),
                              arrays["u_frac"].astype(np.int32),
                              arrays["v_frac"].astype(np.int32), arrays["valid"])
    pa_d = jnp.asarray(pa)
    ukt = jnp.asarray(np.ascontiguousarray(arrays["uk"].T))
    vkt = jnp.asarray(np.ascontiguousarray(arrays["vk"].T))
    wkt = jnp.asarray(np.ascontiguousarray(
        (arrays["wk"] * arrays["valid"][:, None]).T.astype(np.float32)))
    T, K = len(pplan.tasks), pplan.num_layers

    @jax.jit
    def compact(v, vim, pa_d, ukt, vkt, wkt, t, k, gg):
        st = grid_compact_pallas(t, k, gg, pa_d, ukt, vkt, wkt, v, vim,
                                 T, K, wp.subgrid_size, wp.support,
                                 wp.w_support, block_v=pplan.block_v)
        return jnp.sum(jnp.abs(st))

    @jax.jit
    def band(v, vim, ops, idx):
        return jnp.sum(jnp.abs(g._stage_kernel(v, vim, ops, idx)))

    t_i, k_i, g_i = g._grid_indices()
    # parity check (small slice on chip: compare stacks)
    sb = jax.jit(lambda v, vim, ops, idx: g._stage_kernel(v, vim, ops, idx))(
        vre0, vim, g._grid_ops, (t_i, k_i, g_i))
    sc = jax.jit(lambda v, vim, *a: grid_compact_pallas(
        *a[6:], *a[:6], T, K, wp.subgrid_size, wp.support, wp.w_support,
        block_v=pplan.block_v))(vre0, vim, pa_d, ukt, vkt, wkt, vre0, vim, t_i, k_i, g_i) if False else None
    def timeit(name, f, args, iters=15, loops=3):
        s = f(vre0, vim, *args); _ = float(s)
        v = vre0; dts = []
        for _m in range(loops + 1):
            t0 = time.perf_counter()
            for _i in range(iters):
                s = f(v, vim, *args)
                v = fb(v, s)
            _ = float(s)
            dts.append((time.perf_counter() - t0)/iters)
        dt = sorted(dts[1:])[1]
        r = nvis/dt/1e6
        out[f"{tag}_{name}"] = round(r, 1)
        print(f"{tag} {name}: {r:.1f} Mvis/s ({dt*1e3:.2f} ms)", flush=True)
    timeit("band_kernel", band, (g._grid_ops, (t_i, k_i, g_i)))
    timeit("compact_kernel", compact, (pa_d, ukt, vkt, wkt, t_i, k_i, g_i))
    # numeric parity
    s1 = float(jax.jit(lambda v, vim, ops, idx: jnp.sum(jnp.abs(
        g._stage_kernel(v, vim, ops, idx))))(vre0, vim, g._grid_ops, (t_i, k_i, g_i)))
    s2 = float(compact(vre0, vim, pa_d, ukt, vkt, wkt, t_i, k_i, g_i))
    print(f"{tag} parity sums band={s1:.6g} compact={s2:.6g} rel={(abs(s1-s2)/s1):.2e}", flush=True)
    out[f"{tag}_parity_rel"] = abs(s1-s2)/s1
    _GRIDDER_CACHE.clear()
print(json.dumps(out))
