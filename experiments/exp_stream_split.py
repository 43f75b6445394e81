"""Streaming-step stage split + sort payload-count scaling.

The device-planned streaming step measured 180 ms per dense 4.2M-vis
chunk (2026-08-19) with an ESTIMATED cost order (placement merge sort,
prep kernel, geometry+LUT, key sort, packed kernel, folds). This
experiment measures it instead:

  plan        jit(_plan_chunk) alone (placed arrays + counters)
  plan+prep   + fused stream-prep kernel
  plan+prep+kernel  + packed grid kernel
  step        the full production step (fold/FFT/ladder/image)

and, synthetically at the same scale, the MARGINAL COST OF SORT
PAYLOADS — stable [N]-key sort and unstable [N+cap] placement-style
sort with 2/5/8 int32/f32 payloads — to predict the gain from
bit-packing the five small plan fields into two int32 payloads before
committing to that rewrite.

Run: python experiments/exp_stream_split.py
CPU sanity: EXP_CHECK=1 JAX_PLATFORMS=cpu python experiments/exp_stream_split.py
"""
import functools
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
    out = fn()
    red = jax.jit(lambda *xs: sum(jnp.sum(jnp.abs(
        x.astype(jnp.float32))) for x in xs))

    def reduce(o):
        leaves = jax.tree_util.tree_leaves(o)
        return red(*leaves)

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

    # Stage prefixes (each its own jit; the feed perturbs uvw so the
    # geometry/sorts re-run every iteration).
    plan_fn = jax.jit(lambda uvw, m, re, im: eng._plan_chunk(
        uvw, m, re, im, sp.cap, sp.num_blocks, need_unsort=False)[:1])

    def kern_from_plan(uvw, m, re, im):
        # Production fused form (streaming._planes_core): placed packed
        # words feed the in-kernel tap evaluation — no prep stage.
        from ska_sdp_func_tpu.kernels.fused_tap import grid_fused_pallas
        (arrays, _d, block_bucket, _v, _p, _dr,
         _o) = eng._plan_chunk(uvw, m, re, im, sp.cap, sp.num_blocks)
        wplan = sp.wplan
        return grid_fused_pallas(
            block_bucket, arrays["packed_a"], arrays["packed_b"],
            arrays["vre"], arrays["vim"], eng._uv_c, eng._w_c,
            sp.num_buckets, wplan.subgrid_size, wplan.support,
            wplan.w_support, wplan.oversampling, wplan.w_oversampling,
            block_v=sp.block_v, interpret=CHECK)

    kern_fn = jax.jit(kern_from_plan)

    # Attribution stages: geometry+LUT alone (the part of _plan_chunk
    # before the key sort), and the production 5-operand key sort on
    # real geometry (bucket + packed words + vis planes).
    def geom_only(uvw, m, re, im):
        import jax.numpy as jnp
        eng_ = eng
        plan_ = sp.wplan
        d = np.float32(plan_.eff_sg_dist)
        u = (uvw[:, 0:1] * eng_._scale[None, :]).ravel()
        v = (uvw[:, 1:2] * eng_._scale[None, :]).ravel()
        w = (uvw[:, 2:3] * eng_._scale[None, :]).ravel()
        inv_d = np.float32(1.0 / plan_.eff_sg_dist)
        inv_wd = np.float32(1.0 / plan_.w_stack_dist)
        biu = jnp.floor(u * inv_d + 0.5).astype(jnp.int32)
        biv = jnp.floor(v * inv_d + 0.5).astype(jnp.int32)
        biw = jnp.floor(w * inv_wd + 0.5).astype(jnp.int32)
        b0, nb3 = sp.consts["b0"], sp.consts["nb3"]
        i0, i1, i2 = biw - b0[0], biu - b0[1], biv - b0[2]
        inb = ((i0 >= 0) & (i0 < nb3[0]) & (i1 >= 0) & (i1 < nb3[1])
               & (i2 >= 0) & (i2 < nb3[2]))
        li = (i0 * nb3[1] + i1) * nb3[2] + i2
        li = jnp.clip(li, 0, eng_._lut.shape[0] - 1)
        row = eng_._lut2[li]
        task = jnp.where(inb, row[:, 0], -1)
        return task, u - biu.astype(jnp.float32) * d, re, im

    geom_fn = jax.jit(geom_only)

    t_geom = _timed("geometry+LUT", lambda: geom_fn(
        state["uvw"], state["mask"], state["vre"], state["vim"]), feed)

    t_plan = _timed("plan", lambda: plan_fn(
        state["uvw"], state["mask"], state["vre"], state["vim"]), feed)
    t_kern = _timed("plan+kernel", lambda: kern_fn(
        state["uvw"], state["mask"], state["vre"], state["vim"]), feed)

    img_state = {"img": jnp.zeros((image, image), jnp.float32),
                 "p": jnp.zeros((), jnp.int32),
                 "d": jnp.zeros((), jnp.int32),
                 "v": jnp.zeros((), jnp.int32)}

    def step():
        img_state["img"], img_state["p"], img_state["d"], \
            img_state["v"] = eng.step(
                img_state["img"], img_state["p"], img_state["d"],
                img_state["v"], state["uvw"], state["mask"],
                state["vre"], state["vim"])
        return img_state["img"]

    t_step = _timed("step (full)", step, feed)
    if not CHECK:
        print(f"  marginals: kernel {1e3 * (t_kern - t_plan):.1f} ms, "
              f"fold/FFT/image {1e3 * (t_step - t_kern):.1f} ms",
              flush=True)

    # --- synthetic sort payload scaling -------------------------------
    N = nvis
    M = nvis + sp.cap
    for tag, n, stable in (("key-sort  N", N, True),
                           ("place-sort N+cap", M, False)):
        keys0 = jnp.asarray(
            rng.integers(0, 1 << 30, n, dtype=np.int32))
        pay = [jnp.asarray(rng.standard_normal(n), jnp.float32)
               for _ in range(8)]
        kstate = {"k": keys0}
        xor = jax.jit(lambda k, s: k ^ (jnp.floor(s).astype(jnp.int32)
                                        % 1024 + 1))

        def kfeed(s, kstate=kstate, xor=xor):
            kstate["k"] = xor(kstate["k"], s)

        for npay in (2, 5, 8):
            # Keys AND payloads enter as jit ARGUMENTS (a closed-over
            # array bakes in as a constant: the feed mutation would be
            # invisible and the runtime would memoise the call).
            fn = jax.jit(functools.partial(
                lambda stable, k, *p: jax.lax.sort(
                    (k,) + p, dimension=0, is_stable=stable,
                    num_keys=1), stable))
            _timed(f"{tag} +{npay} payloads",
                   lambda fn=fn, npay=npay: fn(kstate["k"],
                                               *pay[:npay]),
                   kfeed, n_loops=5)


if __name__ == "__main__":
    main()
