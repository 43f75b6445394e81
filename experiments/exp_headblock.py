"""Headline-scenario kernel anatomy: where does the 1M-vis whole-image
case lose vs the dense 4.2M stream?

The dense stream (avg ~1080 vis/bucket) runs the band kernel at its
HBM bound (397.7 Mvis/s f32, 2026-08-20); the BASELINE headline (1M
vis over the same task set, avg ~257 vis/bucket) historically runs
~170. Candidate costs: per-grid-step overhead (DMA latency at small
blocks), bucket-switch window flushes, padding. This experiment
measures the kernel-only rate on the REAL headline plan at block 128/
256/512/1024 and, for comparison, on a same-slot-count synthetic
stream with every bucket exactly one block long (maximum switches) vs
all slots in few giant buckets (minimum switches).

Usage: python experiments/exp_headblock.py [--one <cfg json>]
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
ROWS, CHANS = 16384, 64          # 1M vis (the BASELINE headline)


def measure_one(cfg):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import wait_for_chip
    from ska_sdp_func_tpu.parallel import plan_wstack
    from ska_sdp_func_tpu.parallel.packed import (
        packed_gridder, plan_packed)
    from ska_sdp_func_tpu.kernels.packed_tap import grid_packed_pallas
    from ska_sdp_func_tpu.utility.device import device_put

    wait_for_chip()
    bv = cfg["bv"]
    rng = np.random.default_rng(1)
    uvw = rng.uniform(-1, 1, (ROWS, 3))
    uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
    uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
    vis = (rng.standard_normal((ROWS, CHANS))
           + 1j * rng.standard_normal((ROWS, CHANS))
           ).astype(np.complex64)
    nvis = ROWS * CHANS
    plan = plan_wstack(uvw, C_0, C_0 / (100 * CHANS), CHANS, IMAGE,
                       SUBGRID, THETA, W_STEP, support=8, w_support=4,
                       w_tower_height=HEIGHT)
    pplan = plan_packed(plan, uvw, block_v=bv)
    g = packed_gridder(pplan, engine="bands")
    red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                                   + jnp.float32(1e-6) * jnp.tanh(s)))
    visd = device_put(vis)
    vre, vim = g.sort(visd)
    total = pplan.total

    if cfg["kind"] == "fused_row":
        from ska_sdp_func_tpu.kernels.fused_tap import (
            grid_fused_pallas, pack_plan_words)
        from ska_sdp_func_tpu.grid_data.wtower import _tap_coeffs_cached

        arr = pplan.arrays
        pa, pb = pack_plan_words(arr["iv0"], arr["u_off"],
                                 arr["w_row"], arr["u_frac"],
                                 arr["v_frac"], arr["valid"])
        pa, pb = jnp.asarray(pa), jnp.asarray(pb)
        uv_c = _tap_coeffs_cached(plan.support, plan.oversampling)
        w_c = _tap_coeffs_cached(plan.w_support, plan.w_oversampling)
        bb = g.block_bucket

        def call(vre):
            return grid_fused_pallas(
                bb, pa, pb, vre, vim, uv_c, w_c, pplan.num_buckets,
                SUBGRID, plan.support, plan.w_support,
                plan.oversampling, plan.w_oversampling, block_v=bv,
                precision="highest", band_form="row")

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
            cfg, nvis=nvis, total=total, pad=round(total / nvis, 3),
            t_ms=dt * 1e3, mvis_s=nvis / dt / 1e6,
            slot_ns=dt / total * 1e9)), flush=True)
        return

    if cfg["kind"] == "real":
        bb = g.block_bucket
        nb = pplan.num_buckets
    elif cfg["kind"] == "maxswitch":
        # synthetic: every block its own bucket (flush every step)
        nb = total // bv
        bb = jnp.arange(nb, dtype=jnp.int32)
    else:                          # minswitch
        # all blocks share 8 giant buckets (flush ~never)
        nb = 8
        bb = jnp.asarray((np.arange(total // bv) * 8)
                         // (total // bv), np.int32)

    def call(vre):
        return grid_packed_pallas(
            bb, g.ubase, g.vband, (g.wk_t, vre, vim), nb,
            SUBGRID, plan.w_support, block_v=bv)

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
        cfg, nvis=nvis, total=total, pad=round(total / nvis, 3),
        t_ms=dt * 1e3, mvis_s=nvis / dt / 1e6,
        slot_ns=dt / total * 1e9)), flush=True)


def main():
    cfgs = []
    for bv in (128, 256, 512, 1024):
        cfgs.append(dict(kind="real", bv=bv))
        cfgs.append(dict(kind="fused_row", bv=bv))
    for bv in (128, 256):
        cfgs.append(dict(kind="maxswitch", bv=bv))
        cfgs.append(dict(kind="minswitch", bv=bv))
    for cfg in cfgs:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             json.dumps(cfg)],
            capture_output=True, text=True, timeout=2400)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            print(f"{cfg}: FAILED rc {r.returncode}", flush=True)
            for ln in (r.stderr or r.stdout).strip().splitlines()[-6:]:
                print("   ", ln, flush=True)
            continue
        j = json.loads(line[len("RESULT "):])
        print(f"{j['kind']:10s} bv {j['bv']:5d}: {j['mvis_s']:7.1f} "
              f"Mvis/s  pad {j['pad']:.3f}  {j['slot_ns']:.2f} "
              f"ns/slot", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        measure_one(json.loads(sys.argv[2]))
    else:
        main()
