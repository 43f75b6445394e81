"""On-chip throughput: fused (in-kernel taps) vs streamed-band packed
grid/degrid kernels. Dense 4.2M-vis stream, kernel-only chained timing
with readback (PERFORMANCE.md methodology).

Sweeps precision in (highest, high, bf16) and sub_v in (256, 512,
1024) at block_v 1024, plus the old kernels as baselines. Each config
runs in its own subprocess (empty device heap per measurement).

Usage: python experiments/exp_fused.py            # full sweep
       python experiments/exp_fused.py --one <cfg json>
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS, CHANS = 16384, 256


def measure_one(cfg):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import wait_for_chip
    from ska_sdp_func_tpu.parallel import plan_wstack
    from ska_sdp_func_tpu.parallel.packed import (
        packed_gridder, plan_packed)
    from ska_sdp_func_tpu.kernels.packed_tap import grid_packed_pallas
    from ska_sdp_func_tpu.kernels.fused_tap import (
        grid_fused_pallas, degrid_fused2_pallas, pack_plan_words)
    from ska_sdp_func_tpu.grid_data.wtower import _tap_coeffs_cached
    from ska_sdp_func_tpu.utility.device import device_put

    wait_for_chip()
    bv = cfg["bv"]
    rng = np.random.default_rng(1)
    uvw = rng.uniform(-1, 1, (ROWS, 3))
    uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
    uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
    vis = (rng.standard_normal((ROWS, CHANS))
           + 1j * rng.standard_normal((ROWS, CHANS))).astype(np.complex64)
    nvis = ROWS * CHANS
    plan = plan_wstack(uvw, C_0, C_0 / (100 * CHANS), CHANS, IMAGE,
                       SUBGRID, THETA, W_STEP, support=8, w_support=4,
                       w_tower_height=HEIGHT)
    pplan = plan_packed(plan, uvw, block_v=bv)
    # The streamed-band baselines need the round-3 band engine (the
    # fused default no longer builds wk_t/ubase/vband).
    banded = cfg["kind"] == "grid_stream" or cfg["prec"] == "stream"
    g = packed_gridder(pplan, fast=(cfg["prec"] == "bf16"),
                       engine="bands" if banded else "fused")
    red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                                   + jnp.float32(1e-6) * jnp.tanh(s)))
    visd = device_put(vis)
    vre, vim = g.sort(visd)
    arr = pplan.arrays
    uv_c = _tap_coeffs_cached(plan.support, plan.oversampling)
    w_c = _tap_coeffs_cached(plan.w_support, plan.w_oversampling)

    if cfg["kind"] == "grid_fused":
        pa, pb = pack_plan_words(arr["iv0"], arr["u_off"], arr["w_row"],
                                 arr["u_frac"], arr["v_frac"],
                                 arr["valid"])
        pa, pb = jnp.asarray(pa), jnp.asarray(pb)

        def call(vre):
            return grid_fused_pallas(
                g.block_bucket, pa, pb, vre, vim, uv_c, w_c,
                pplan.num_buckets, SUBGRID, plan.support,
                plan.w_support, plan.oversampling, plan.w_oversampling,
                block_v=bv, sub_v=cfg["sub"], precision=cfg["prec"],
                band_form=cfg.get("form", "col"))
    elif cfg["kind"] == "grid_stream":
        def call(vre):
            scales = jnp.concatenate([g.wk_t * vre[None, :],
                                      g.wk_t * vim[None, :]], axis=0)
            return grid_packed_pallas(
                g.block_bucket, g.ubase, g.vband, scales,
                pplan.num_buckets, SUBGRID, plan.w_support,
                block_v=bv, fast=(cfg["prec"] == "bf16"))
    elif cfg["kind"] == "degrid_fused":
        from ska_sdp_func_tpu.kernels.packed_tap import (
            degrid_fused_pallas)

        pa, pb = pack_plan_words(arr["iv0"], arr["u_off"], arr["w_row"],
                                 arr["u_frac"], arr["v_frac"],
                                 arr["valid"])
        pa, pb = jnp.asarray(pa), jnp.asarray(pb)
        model = jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0)
        # ladder/pref must ride as jit ARGUMENTS: a complex device
        # array captured as a closure constant lowers via a complex
        # D2H of its value, which the tunnel rejects (UNIMPLEMENTED)
        # — this killed every degrid variant of the 2026-08-20 sweep.
        st = jax.jit(lambda im, lad, pref: g._dstage_layers(
            g._dstage_planes(im), lad, pref))(
                model, g.ladder_degrid, g.pref_degrid)
        st = jax.block_until_ready(st)
        p_idx, g_idx, hv_idx = g._degrid_indices()

        if cfg["prec"] == "stream":
            def call(st):
                return degrid_fused_pallas(
                    st, p_idx, g_idx, hv_idx, g.ubase, g.vband_t,
                    g.wk_t, plan.w_support, block_v=bv, raw=True)
        else:
            def call(st):
                return degrid_fused2_pallas(
                    st, p_idx, g_idx, hv_idx, pa, pb, uv_c, w_c,
                    SUBGRID, plan.support, plan.w_support,
                    plan.oversampling, plan.w_oversampling,
                    block_v=bv, sub_v=cfg["sub"],
                    precision=cfg["prec"], raw=True)

        fbs = jax.jit(lambda st, s: st * (jnp.float32(1.0)
                                          + jnp.float32(1e-6)
                                          * jnp.tanh(s)))
        out = call(st)
        _ = float(red(out))
        for _loop in range(2):
            t0 = time.perf_counter()
            for _i in range(12):
                out = call(st)
                st = fbs(st, red(out))
            _ = float(red(out))
            dt = (time.perf_counter() - t0) / 12
        print("RESULT " + json.dumps(dict(
            cfg, nvis=nvis, total=pplan.total, t=dt,
            mvis_s=nvis / dt / 1e6)), flush=True)
        return

    out = call(vre)
    _ = float(red(out))
    for _loop in range(2):
        t0 = time.perf_counter()
        for _i in range(12):
            out = call(vre)
            vre = fb(vre, red(out))
        _ = float(red(out))
        dt = (time.perf_counter() - t0) / 12
    print("RESULT " + json.dumps(dict(
        cfg, nvis=nvis, total=pplan.total, t=dt,
        mvis_s=nvis / dt / 1e6)), flush=True)


def main():
    cfgs = []
    for prec in ("highest", "high", "bf16"):
        for sub in (256, 512, 1024):
            cfgs.append(dict(kind="grid_fused", bv=1024, sub=sub,
                             prec=prec))
    cfgs.append(dict(kind="grid_stream", bv=1024, sub=0, prec="highest"))
    cfgs.append(dict(kind="grid_stream", bv=1024, sub=0, prec="bf16"))
    for prec in ("highest", "high", "bf16"):
        cfgs.append(dict(kind="degrid_fused", bv=1024, sub=512,
                         prec=prec))
    cfgs.append(dict(kind="degrid_fused", bv=1024, sub=0, prec="stream"))
    for cfg in cfgs:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             json.dumps(cfg)],
            capture_output=True, text=True, timeout=2400)
        line = next((ln for ln in res.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            print(f"{cfg}: FAILED rc {res.returncode}", flush=True)
            tail = (res.stderr or res.stdout).strip().splitlines()
            for ln in tail[-6:]:
                print("   ", ln, flush=True)
            continue
        r = json.loads(line[len("RESULT "):])
        print(f"{r['kind']:12s} bv {r['bv']} sub {r['sub']:4d} "
              f"{r['prec']:8s}: {r['mvis_s']:7.1f} Mvis/s "
              f"({r['t'] * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        measure_one(json.loads(sys.argv[2]))
    else:
        main()
