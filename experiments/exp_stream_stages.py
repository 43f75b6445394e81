"""Stage attribution for the device-planned streaming chunk step.

Times (chained + readback, PERFORMANCE.md methodology) on the dense
4.2M-vis chunk:
  sort     - stable argsort of the bucket keys alone
  plan     - _plan_chunk (geometry + bincount + argsort + 8 scatters)
  step     - the full chunk step (plan + taps + kernel + folds + FFTs)
so step-plan isolates the compute pipeline and plan-sort the
scatter/bincount placement cost.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS, CHANS = 16384, 256

from bench import wait_for_chip                     # noqa: E402
from ska_sdp_func_tpu.parallel import (             # noqa: E402
    StreamingGridder,
    plan_stream,
    plan_wstack,
    stream_tasks,
)

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
BV = int(os.environ.get("EXP_BV", "512"))
sp = plan_stream(plan, stream_tasks(plan, uvw), chunk_rows=ROWS,
                 block_v=BV, cap_factor=1.4)
eng = StreamingGridder(sp)._engine
print(f"plan: {len(sp.tasks)} tasks, {sp.num_buckets} buckets, "
      f"cap {sp.cap} ({sp.cap / nvis:.2f}x), block {BV}", flush=True)

uvw32 = jnp.asarray(uvw.astype(np.float32))
mask = jnp.asarray(np.ones(ROWS, bool))
vre = jnp.asarray(vis.real.astype(np.float32))
vim = jnp.asarray(vis.imag.astype(np.float32))

red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
fb = jax.jit(lambda x, s: x * (jnp.float32(1.0)
                               + jnp.float32(1e-6) * jnp.tanh(s)))


def timeit(name, fn, feedback, n=10):
    out = fn(uvw32)
    _ = float(red(feedback(out)))
    for _loop in range(2):
        t0 = time.perf_counter()
        u = uvw32
        for _ in range(n):
            out = fn(u)
            u = fb(u, red(feedback(out)))
        _ = float(red(feedback(out)))
        dt = (time.perf_counter() - t0) / n
    print(f"{name:6s}: {dt * 1e3:8.2f} ms  ({nvis / dt / 1e6:7.1f} "
          f"Mvis/s)", flush=True)
    return dt


sort_fn = jax.jit(lambda u: jnp.argsort(
    (u[:, 0:1] * eng._scale[None, :]).ravel().astype(jnp.int32),
    stable=True))
timeit("sort", sort_fn, lambda o: o.astype(jnp.float32)[:4096])

plan_fn = jax.jit(lambda u: eng._plan_chunk(u, mask)[0]["u_frac"])
timeit("plan", plan_fn, lambda o: o[:4096])

step_fn = jax.jit(lambda u: eng._planes_core(
    u, mask, vre, vim, sp.cap, sp.num_blocks)[0])
timeit("step", step_fn, lambda o: jnp.abs(o[0, :64, :64]))


# -- finer prefixes through the step pipeline (round 3) ----------------

def _prefix(upto):
    """Build a jitted prefix of _planes_core up to a named stage."""
    splan = eng.splan
    plan = splan.wplan

    def fn(u):
        from ska_sdp_func_tpu.kernels.packed_tap import (
            grid_packed_pallas,
            stream_prep_grid_pallas,
        )
        from ska_sdp_func_tpu.parallel.packed import _fold_windows
        from ska_sdp_func_tpu.parallel.streaming import (
            _cplx,
            fft_shifted,
            ifft_shifted,
        )
        import jax.numpy as jnp

        (arrays, _dest, block_bucket, visited, processed, dropped,
         overflow) = eng._plan_chunk(u, mask, vre, vim)
        ubase, vband, scales = stream_prep_grid_pallas(
            arrays["u_off"], arrays["u_frac"], arrays["v_frac"],
            arrays["w_row"], arrays["vre"], arrays["vim"],
            arrays["iv0"], eng._uv_c, eng._w_c,
            plan.oversampling, plan.w_oversampling, plan.support,
            plan.w_support, plan.subgrid_size, splan.block_v,
            fast=eng.fast, interpret=eng.interpret)
        if upto == "prep":
            return scales[:, :4096]
        wins = grid_packed_pallas(
            block_bucket, ubase, vband, scales, splan.num_buckets,
            plan.subgrid_size, plan.w_support, block_v=splan.block_v,
            fast=eng.fast, interpret=eng.interpret)
        if upto == "kern":
            return wins[0, :8, 0, :]
        layers = _fold_windows(wins, visited, len(splan.tasks),
                               splan.num_slabs, splan.num_octets,
                               plan.w_support, splan.num_layers,
                               eng.interpret)
        if upto == "fold":
            return jnp.abs(layers[0, 0, :64, :64])
        layers = ifft_shifted(layers)
        subgrids = jnp.einsum("tkuv,kuv->tuv", layers,
                              _cplx(eng.ladder)) * _cplx(eng.pref)
        subgrids = fft_shifted(subgrids)
        return jnp.abs(subgrids[0, :64, :64])

    return jax.jit(fn)


for name in ("prep", "kern", "fold", "drain"):
    timeit(name, _prefix(name), lambda o: o)
