"""MXU precision sweep for the packed kernels (real chip).

PERFORMANCE.md records that f32 dots measure ~1e-5 relative error at
ANY precision flag on this chip, while HIGHEST costs extra MXU passes
(1229 vs 1130 ns/block at block 256 measured round 2 — and the pass
count should matter MORE at large blocks where the dot dominates the
fixed overhead). This sweep measures grid+degrid whole-call times AND
interior accuracy vs the f64 task-driver oracle for
HIGHEST / HIGH / DEFAULT at a large block size, to decide the
production default.

Each config runs in its own subprocess (fresh device heap + fresh jit
cache — the kernels read the precision at trace time).
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
BLOCK = 512
PRECISIONS = ("HIGHEST", "HIGH", "DEFAULT")


def measure_one(prec: str):
    import numpy as np
    import jax

    import ska_sdp_func_tpu.kernels.packed_tap as pt

    # Patch the kernel precision BEFORE any trace happens.
    pmap = {"HIGHEST": jax.lax.Precision.HIGHEST,
            "HIGH": jax.lax.Precision.HIGH,
            "DEFAULT": jax.lax.Precision.DEFAULT}
    pt._precision = lambda fast, _p=pmap[prec]: _p

    import jax.numpy as jnp

    from bench import wait_for_chip
    from ska_sdp_func_tpu.parallel import plan_wstack
    from ska_sdp_func_tpu.parallel.packed import (
        packed_gridder,
        plan_packed,
    )
    from ska_sdp_func_tpu.utility.device import device_put

    wait_for_chip()
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
    red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    redc = jax.jit(lambda x: jnp.sum(jnp.abs(x.real) + jnp.abs(x.imag)))
    fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                                   + jnp.float32(1e-6) * jnp.tanh(s)))
    fbi = jax.jit(lambda m, s: m + jnp.float32(1e-6) * jnp.tanh(s))

    pplan = plan_packed(plan, uvw, block_v=BLOCK)
    g = packed_gridder(pplan)
    vre, vim = g.sort(device_put(vis))
    img = g.grid_sorted(vre, vim)
    _ = float(red(img))
    for _loop in range(2):
        t0 = time.perf_counter()
        for _i in range(10):
            img = g.grid_sorted(vre, vim)
            vre = fb(vre, red(img))
        _ = float(red(img))
        dt = (time.perf_counter() - t0) / 10
    img0 = np.asarray(jax.device_get(g.grid_sorted(*g.sort(device_put(vis)))))

    model = jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0)
    vs = g.degrid_sorted(model)
    _ = float(redc(vs))
    m = model
    for _loop in range(2):
        t0 = time.perf_counter()
        for _i in range(10):
            vs = g.degrid_sorted(m)
            m = fbi(m, redc(vs))
        _ = float(redc(vs))
        ddt = (time.perf_counter() - t0) / 10

    np.save(f"/tmp/exp_prec_img_{prec}.npy", img0)
    print("RESULT " + json.dumps({
        "prec": prec, "nvis": nvis, "grid_s": dt, "degrid_s": ddt,
    }), flush=True)


def main():
    rows = {}
    for prec in PRECISIONS:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", prec],
            capture_output=True, text=True, timeout=2400)
        line = next((ln for ln in res.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            print(f"{prec}: FAILED (rc {res.returncode})", flush=True)
            for ln in (res.stderr or res.stdout).strip().splitlines()[-6:]:
                print("   ", ln, flush=True)
            continue
        r = json.loads(line[len("RESULT "):])
        rows[prec] = r
        print(f"{prec:8s} block {BLOCK}: grid "
              f"{r['nvis'] / r['grid_s'] / 1e6:.1f} Mvis/s "
              f"({r['grid_s'] * 1e3:.2f} ms)  degrid "
              f"{r['nvis'] / r['degrid_s'] / 1e6:.1f} Mvis/s "
              f"({r['degrid_s'] * 1e3:.2f} ms)", flush=True)

    import numpy as np
    if "HIGHEST" in rows:
        ref = np.load("/tmp/exp_prec_img_HIGHEST.npy")
        peak = np.abs(ref).max()
        for prec in PRECISIONS[1:]:
            if prec not in rows:
                continue
            img = np.load(f"/tmp/exp_prec_img_{prec}.npy")
            print(f"  {prec} vs HIGHEST image: max abs diff "
                  f"{np.abs(img - ref).max() / peak:.2e} of peak",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        measure_one(sys.argv[2])
    else:
        main()
