"""On-chip streaming-ingest benchmark: device-planned chunked gridding
(parallel/streaming.py) vs the host-planned packed path on a dense
4.2M-vis chunk stream.

Reports:
  * streaming sustained Mvis/s (device plan + grid per chunk, chained
    through the accumulating image — the accumulator changes every
    call, so the tunnel's value-memoisation cannot kick in)
  * host-planned packed whole-image Mvis/s on the same data (plan
    excluded — the solver amortises it) and the host plan build time
    (what streaming eliminates from the loop)

Timing follows PERFORMANCE.md: one throwaway warm loop, clock stopped
only after float(readback) of a reduction over the final output.
Chunks are pre-uploaded (H2D through the ~30 MB/s tunnel would swamp
the measurement; real deployments have GB/s hosts — report the rate
both ways there).

Run: python experiments/exp_stream.py    (EXP_FAST=1 for bf16 mode)
CPU check: EXP_CHECK=1 JAX_PLATFORMS=cpu python experiments/exp_stream.py
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
    packed_gridder,
    plan_packed,
    plan_stream,
    plan_wstack,
    stream_tasks,
)

C_0 = 299792458.0
FAST = bool(int(os.environ.get("EXP_FAST", "0")))


def main():
    if CHECK:
        rows, chans, image, n_chunks = 256, 4, 256, 2
    else:
        wait_for_chip()
        rows, chans, image, n_chunks = 16384, 256, 512, 4
    rng = np.random.default_rng(1)
    uvw0 = rng.uniform(-1, 1, (rows, 3))
    uvw0[:, :2] *= 0.45 * image / 2 / 0.002
    uvw0[:, 2] *= 1.5 * 100.0 * 4.0
    nvis = rows * chans
    plan = plan_wstack(uvw0, C_0, C_0 / (100 * chans), chans, image,
                       128, 0.002, 100.0, support=8, w_support=4,
                       w_tower_height=4.0)

    # Distinct chunks (rotated uvw) so no two steps see equal values.
    chunks = []
    for c in range(n_chunks):
        uvw_c = uvw0 * (1.0 - 0.01 * c)
        vis_c = (rng.standard_normal((rows, chans))
                 + 1j * rng.standard_normal((rows, chans))
                 ).astype(np.complex64)
        chunks.append((uvw_c, vis_c))

    boxes = stream_tasks(plan, np.concatenate([u for u, _ in chunks]))
    # Dense production chunks pad ~1.03-1.3x at block 256; the tiny
    # CPU-check scenario is sparse and needs an explicit capacity.
    sp = plan_stream(plan, boxes, chunk_rows=rows, block_v=256,
                     cap_factor=1.4) if not CHECK else \
        plan_stream(plan, boxes, chunk_rows=rows, block_v=128,
                    cap_slots=200 * 128)
    print(f"stream plan: {len(sp.tasks)} tasks, {sp.num_layers} "
          f"layers, {sp.num_buckets} buckets, cap {sp.cap} "
          f"({sp.cap / nvis:.2f}x)", flush=True)

    sg = StreamingGridder(sp, fast=FAST)
    # Pre-stage device inputs the way accumulate() would.
    staged = []
    for uvw_c, vis_c in chunks:
        staged.append((
            jnp.asarray(uvw_c.astype(np.float32)),
            jnp.asarray(np.ones(rows, bool)),
            jnp.asarray(vis_c.real.astype(np.float32)),
            jnp.asarray(vis_c.imag.astype(np.float32))))

    def run_pass(state):
        image_acc, p, d, v = state
        for uvw_d, mask_d, vre_d, vim_d in staged:
            image_acc, p, d, v = sg._engine.step(
                image_acc, p, d, v, uvw_d, mask_d, vre_d, vim_d)
        return image_acc, p, d, v

    # Three distinct buffers: donated args must not alias.
    state = (jnp.zeros((image, image), jnp.float32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    state = run_pass(state)                      # compile
    float(jnp.sum(jnp.abs(state[0])))
    n_loops = 1 if CHECK else 3
    for _ in range(2):                           # warm, then measured
        t0 = time.perf_counter()
        for _ in range(n_loops):
            state = run_pass(state)
        _ = float(jnp.sum(jnp.abs(state[0])))
        dt = (time.perf_counter() - t0) / (n_loops * n_chunks)
    rate = nvis / dt / 1e6
    print(f"streaming: {dt * 1e3:.2f} ms/chunk -> {rate:.1f} Mvis/s "
          f"sustained (fast={FAST})", flush=True)
    total_passes = 1 + 2 * n_loops
    processed, dropped, voided = (int(x) for x in state[1:])
    print(f"counters: processed {processed} (expected "
          f"{total_passes * n_chunks * nvis}), dropped {dropped}, "
          f"voided {voided}")

    # H2D cost of one chunk's raw inputs (uvw f32 + vis re/im f32):
    # the tunnel sustains ~30 MB/s so this dominates END-TO-END rate
    # here; real deployments have GB/s hosts — report separately.
    if not CHECK:
        h2d_bytes = rows * 3 * 4 + 2 * rows * chans * 4
        t0 = time.perf_counter()
        a = jnp.asarray(chunks[0][0].astype(np.float32) * 0.99)
        b = jnp.asarray(chunks[0][1].real.astype(np.float32) * 0.99)
        c = jnp.asarray(chunks[0][1].imag.astype(np.float32) * 0.99)
        _ = float(jnp.sum(a) + jnp.sum(b) + jnp.sum(c))
        h2d_dt = time.perf_counter() - t0
        print(f"H2D: {h2d_bytes / 1e6:.0f} MB/chunk in {h2d_dt:.2f} s "
              f"({h2d_bytes / h2d_dt / 1e6:.0f} MB/s; end-to-end "
              f"{nvis / (dt + h2d_dt) / 1e6:.1f} Mvis/s on this link)",
              flush=True)

    # Host-planned packed path on chunk 0 for comparison.
    t0 = time.perf_counter()
    pplan = plan_packed(plan, chunks[0][0])
    t_plan = time.perf_counter() - t0
    g = packed_gridder(pplan, fast=FAST)
    # device_put shim: a bare jnp.asarray of complex numpy is a
    # complex H2D, which the tunnel rejects after any scalar readback.
    from ska_sdp_func_tpu.utility.device import device_put
    vre, vim = g.sort(device_put(chunks[0][1]))
    img = g.grid_sorted(vre, vim)
    float(jnp.sum(jnp.abs(img)))
    fb = jax.jit(lambda x, s: x * (jnp.float32(1.0)
                                   + jnp.float32(1e-6) * jnp.tanh(s)))
    red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(10 if not CHECK else 2):
            img = g.grid_sorted(vre, vim)
            vre = fb(vre, red(img))
        _ = float(red(img))
        dtp = (time.perf_counter() - t0) / (10 if not CHECK else 2)
    print(f"packed:    {dtp * 1e3:.2f} ms/grid -> "
          f"{nvis / dtp / 1e6:.1f} Mvis/s (host plan build "
          f"{t_plan:.2f} s = {t_plan / nvis * 1e9:.0f} ns/vis)",
          flush=True)


if __name__ == "__main__":
    main()
