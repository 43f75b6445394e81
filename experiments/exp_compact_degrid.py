"""Compact-stream degrid (84 B/slot, in-kernel placement) vs the band
degrid (592 B/slot, DMA-bound): kernel-only rates + parity."""
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ska_sdp_func_tpu.parallel import plan_wstack
from ska_sdp_func_tpu.parallel.packed import plan_packed, packed_gridder, _GRIDDER_CACHE
from ska_sdp_func_tpu.kernels.fused_tap import degrid_compact_pallas, pack_plan_words

C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS = 16384
rng = np.random.default_rng(1)
uvw = rng.uniform(-1, 1, (ROWS, 3))
uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
fbi = jax.jit(lambda m, s: m + jnp.float32(1e-6)*jnp.tanh(s))
out = {}
for tag, chans in (("head", 64), ("dense", 256)):
    plan = plan_wstack(uvw, C_0, C_0/(100*chans), chans, IMAGE, SUBGRID,
                       THETA, W_STEP, support=8, w_support=4, w_tower_height=HEIGHT)
    pplan = plan_packed(plan, uvw)
    nvis = ROWS * chans
    wp = pplan.wplan
    arrays = pplan.arrays
    g = packed_gridder(pplan)            # bands
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
    t_i, k_i, g_i = g._degrid_indices()
    m0 = jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0)

    # shared layer-stack builder (not timed; both kernels consume st)
    st_fn = jax.jit(lambda img, ladder, pref, screens: g._dstage_layers(
        g._dstage_planes(img, screens), ladder, pref))
    st = st_fn(m0, g.ladder_degrid, g.pref_degrid, g.screens_degrid)

    @jax.jit
    def band_k(st, ops, t, k, gg):
        wk_t, ubase, vband_t = ops
        from ska_sdp_func_tpu.kernels.packed_tap import degrid_stack_pallas
        vs = degrid_stack_pallas(st, t, k, gg, ubase, vband_t, wk_t,
                                 wp.w_support, block_v=pplan.block_v)
        return jnp.sum(jnp.abs(vs.real)) + jnp.sum(jnp.abs(vs.imag))

    @jax.jit
    def comp_k(st, pa_d, ukt, vkt, wkt, t, k, gg):
        vs = degrid_compact_pallas(st, t, k, gg, pa_d, ukt, vkt, wkt,
                                   wp.support, wp.w_support,
                                   block_v=pplan.block_v)
        return jnp.sum(jnp.abs(vs.real)) + jnp.sum(jnp.abs(vs.imag))

    def timeit(name, f, args):
        s = f(st, *args); _ = float(s)
        stv = st; dts = []
        for _m in range(4):
            t0 = time.perf_counter()
            for _i in range(12):
                s = f(stv, *args)
                stv = stv * (1.0 + 1e-7)   # chain
            _ = float(s)
            dts.append((time.perf_counter()-t0)/12)
        dt = sorted(dts[1:])[1]
        out[f"{tag}_{name}"] = round(nvis/dt/1e6, 1)
        print(f"{tag} {name}: {nvis/dt/1e6:.1f} Mvis/s ({dt*1e3:.2f} ms)", flush=True)
        return float(s)
    s1 = timeit("band_dkernel", band_k, (g._degrid_ops, t_i, k_i, g_i))
    s2 = timeit("compact_dkernel", comp_k, (pa_d, ukt, vkt, wkt, t_i, k_i, g_i))
    # parity on identical input
    v1 = float(band_k(st, g._degrid_ops, t_i, k_i, g_i))
    v2 = float(comp_k(st, pa_d, ukt, vkt, wkt, t_i, k_i, g_i))
    print(f"{tag} parity band={v1:.6g} compact={v2:.6g} rel={abs(v1-v2)/max(v1,1e-9):.2e}", flush=True)
    out[f"{tag}_parity"] = abs(v1-v2)/max(v1,1e-9)
    _GRIDDER_CACHE.clear()
print(json.dumps(out))
