"""Post-DMA-placement plan-stage split (round 3).

Splits jit(_plan_chunk) itself at dense-chunk scale: geometry+LUT
only, + key sort, full plan, full step — to locate the residual cost
after the gap-insertion DMA placement replaced the placement merge
sort (expected ~50 ms save, measured only ~12 ms at the step level).

Run: python experiments/exp_plan_split.py
CPU sanity: EXP_CHECK=1 JAX_PLATFORMS=cpu python experiments/exp_plan_split.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

CHECK = bool(int(os.environ.get("EXP_CHECK", "0")))
import jax

if CHECK:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bench import wait_for_chip  # noqa: E402
from ska_sdp_func_tpu.parallel import (  # noqa: E402
    StreamingGridder,
    plan_stream,
    plan_wstack,
    stream_tasks,
)

C_0 = 299792458.0


def _timed(name, fn, feed, n_loops=10):
    red = jax.jit(lambda *xs: sum(jnp.sum(jnp.abs(
        x.astype(jnp.float32))) for x in xs))

    def reduce(o):
        return red(*jax.tree_util.tree_leaves(o))

    out = fn()
    _ = float(reduce(out))
    if CHECK:
        print(f"{name}: ok (CPU check)")
        return 0.0
    for _loop in range(2):
        t0 = time.perf_counter()
        for _i in range(n_loops):
            out = fn()
            feed(reduce(out))
        _ = float(reduce(out))
        dt = (time.perf_counter() - t0) / n_loops
    print(f"{name:22s}: {dt * 1e3:7.2f} ms", flush=True)
    return dt


def main():
    if CHECK:
        rows, chans, image = 256, 4, 256
    else:
        wait_for_chip()
        rows, chans, image = 16384, 256, 512
    rng = np.random.default_rng(1)
    uvw0 = rng.uniform(-1, 1, (rows, 3))
    uvw0[:, :2] *= 0.45 * image / 2 / 0.002
    uvw0[:, 2] *= 1.5 * 100.0 * 4.0
    nvis = rows * chans
    plan = plan_wstack(uvw0, C_0, C_0 / (100 * chans), chans, image,
                       128, 0.002, 100.0, support=8, w_support=4,
                       w_tower_height=4.0)
    boxes = stream_tasks(plan, uvw0)
    sp = (plan_stream(plan, boxes, chunk_rows=rows, block_v=256,
                      cap_factor=1.4) if not CHECK else
          plan_stream(plan, boxes, chunk_rows=rows, block_v=128,
                      cap_slots=200 * 128))
    print(f"stream plan: {len(sp.tasks)} tasks, {sp.num_buckets} "
          f"buckets, cap {sp.cap} ({sp.cap / nvis:.2f}x), N={nvis}",
          flush=True)
    sg = StreamingGridder(sp)
    eng = sg._engine

    vis = (rng.standard_normal((rows, chans))
           + 1j * rng.standard_normal((rows, chans))).astype(np.complex64)
    state = {
        "uvw": jnp.asarray(uvw0.astype(np.float32)),
        "mask": jnp.asarray(np.ones(rows, bool)),
        "vre": jnp.asarray(vis.real.astype(np.float32)),
        "vim": jnp.asarray(vis.imag.astype(np.float32)),
    }
    fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                                   + jnp.float32(1e-7) * jnp.tanh(s)))

    def feed(s):
        state["uvw"] = fb(state["uvw"], s)

    splan = sp
    wplan = sp.wplan

    # -- geometry + LUT + bucket keys only (no sort) --
    def geom(uvw, m, re, im):
        # mirror of _plan_chunk's entry-scale front section
        u = (uvw[:, 0:1] * eng._scale[None, :]).ravel()
        v = (uvw[:, 1:2] * eng._scale[None, :]).ravel()
        w = (uvw[:, 2:3] * eng._scale[None, :]).ravel()
        inv_d = np.float32(1.0 / wplan.eff_sg_dist)
        inv_wd = np.float32(1.0 / wplan.w_stack_dist)
        biu = jnp.floor(u * inv_d + 0.5).astype(jnp.int32)
        biv = jnp.floor(v * inv_d + 0.5).astype(jnp.int32)
        biw = jnp.floor(w * inv_wd + 0.5).astype(jnp.int32)
        b0, nb3 = splan.consts["b0"], splan.consts["nb3"]
        i0, i1, i2 = biw - b0[0], biu - b0[1], biv - b0[2]
        li = (i0 * nb3[1] + i1) * nb3[2] + i2
        li = jnp.clip(li, 0, eng._lut.shape[0] - 1)
        row = eng._lut2[li] if eng._lut2 is not None else None
        return (biu + biv) if row is None else row

    # -- key sort alone at the same payload set --
    def keysort(uvw, m, re, im):
        n = nvis
        key = jnp.floor(uvw[:, 0:1] * eng._scale[None, :]).ravel()
        key = key.astype(jnp.int32) & 32767
        pa = key * 3
        pb = key ^ 1234
        return jax.lax.sort((key, pa, pb, re.ravel(), im.ravel()),
                            dimension=0, is_stable=True, num_keys=1)[0]

    plan_fn = jax.jit(lambda uvw, m, re, im: eng._plan_chunk(
        uvw, m, re, im, sp.cap, sp.num_blocks)[:1])
    step = eng.step
    geom_fn = jax.jit(geom)
    keysort_fn = jax.jit(keysort)

    def args():
        return (state["uvw"], state["mask"], state["vre"], state["vim"])

    _timed("geom+lut", lambda: geom_fn(*args()), feed)
    _timed("keysort N+4", lambda: keysort_fn(*args()), feed)
    _timed("plan (full)", lambda: plan_fn(*args()), feed)

    img = jnp.zeros((wplan.image_size, wplan.image_size), jnp.float32)
    z = jnp.zeros((), jnp.int32)
    _timed("step (full)", lambda: step(img, z, z, z, *args()), feed,
           n_loops=5)


if __name__ == "__main__":
    main()
