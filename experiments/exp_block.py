"""Block-size sweep on the real chip: dense 4.2M-vis stream, grid +
degrid at block_v in (128, 256, 512, 1024, 2048). Chained timing with
readback (PERFORMANCE.md methodology).

Each block size runs in its OWN SUBPROCESS: a packed plan's device
band arrays are GB-scale at 4.2M vis and the driver caches keep them
referenced, so an in-process sweep accumulates HBM until the largest
f32 config dies with RESOURCE_EXHAUSTED (observed 2026-08-18) — the
isolation makes every measurement start from an empty device heap.

Also fits the per-block cost model time = fixed + marginal * block_v
from consecutive whole-call times, to calibrate
_BLOCK_OVERHEAD_VIS / _BLOCK_CANDIDATES in parallel/packed.py:
if the dot is latency-bound (fixed >> marginal * 128), larger blocks
win far more than the padded-total model predicts.
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
BLOCKS = (128, 256, 512, 1024, 2048)


def measure_one(bv: int, fast: bool):
    """Measure one block size (runs in a fresh subprocess)."""
    import numpy as np
    import jax
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

    visd = device_put(vis)
    model0 = jnp.zeros((IMAGE, IMAGE), jnp.float32).at[300, 200].set(1.0)
    pplan = plan_packed(plan, uvw, block_v=bv)
    g = packed_gridder(pplan, fast=fast)
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
    print("RESULT " + json.dumps({
        "bv": bv, "fast": fast, "nvis": nvis, "total": pplan.total,
        "blocks": pplan.total // bv, "grid_s": dt, "degrid_s": ddt,
    }), flush=True)


def main():
    fast = bool(int(os.environ.get("EXP_FAST", "0")))
    rows = []
    for bv in BLOCKS:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(bv)],
            capture_output=True, text=True, timeout=2400,
            env=dict(os.environ, EXP_FAST="1" if fast else "0"))
        line = next((ln for ln in res.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            print(f"block {bv}: FAILED (rc {res.returncode})",
                  flush=True)
            tail = (res.stderr or res.stdout).strip().splitlines()
            for ln in tail[-8:]:
                print("   ", ln, flush=True)
            continue
        r = json.loads(line[len("RESULT "):])
        nvis, dt, ddt = r["nvis"], r["grid_s"], r["degrid_s"]
        print(f"{'bf16 ' if fast else ''}block {bv:4d}: stream "
              f"{r['total']} ({r['total'] / nvis:.3f}x pad, "
              f"{r['blocks']} blocks)  "
              f"grid {nvis / dt / 1e6:.1f} Mvis/s ({dt * 1e3:.2f} ms)  "
              f"degrid {nvis / ddt / 1e6:.1f} Mvis/s ({ddt * 1e3:.2f} ms)",
              flush=True)
        rows.append((bv, r["blocks"], dt, ddt))

    # Two-point fixed/marginal fits on whole-call times (coarse —
    # includes folds/FFTs, which are block-independent, so differences
    # isolate the kernel's per-block cost).
    for (b1, n1, t1, d1), (b2, n2, t2, d2) in zip(rows, rows[1:]):
        if n1 == n2:
            continue
        for name, x1, x2 in (("grid", t1, t2), ("degrid", d1, d2)):
            fixed = (x1 - x2) / (n1 - n2)
            resid = x1 - fixed * n1
            print(f"  {name} fit blocks {b1}/{b2}: per-block fixed "
                  f"{fixed * 1e9:.0f} ns, block-independent "
                  f"{resid * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        measure_one(int(sys.argv[2]),
                    bool(int(os.environ.get("EXP_FAST", "0"))))
    else:
        main()
