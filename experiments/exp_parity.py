"""Parity-split accumulator experiment for the packed grid kernel.

Hypothesis: consecutive blocks of the same bucket serialise on the
VMEM window accumulate (``out_ref += contrib``) — dot *b+1* is data-
independent of dot *b*, but the in-order VLIW stream may stall on the
add chain. Splitting the accumulator into ``slots`` parity scratch
buffers halves the add-chain depth; if the measured per-block time
drops, the kernel is add-chain-bound and the production kernel should
adopt the split (plus a slot-sum at the bucket flush).

Run on the real chip: ``python experiments/exp_parity.py``.
CPU parity check: ``EXP_CHECK=1 JAX_PLATFORMS=cpu python
experiments/exp_parity.py`` (interpret mode, tiny scenario).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import wait_for_chip  # noqa: E402
from ska_sdp_func_tpu.kernels.packed_tap import (  # noqa: E402
    WIN_ROWS,
    _VMEM_LIMIT,
    grid_packed_pallas,
)
from ska_sdp_func_tpu.parallel import plan_wstack  # noqa: E402
from ska_sdp_func_tpu.parallel.packed import (  # noqa: E402
    packed_gridder,
    plan_packed,
)
from ska_sdp_func_tpu.utility.device import device_put  # noqa: E402

C_0 = 299792458.0


def _grid_kernel_parity(bucket_ref, ubase_ref, vband_ref, scales_ref,
                        out_ref, acc_ref, *, num_p: int, slots: int):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    prev = bucket_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != bucket_ref[b])
    nxt = bucket_ref[jnp.minimum(b + 1, nb - 1)]
    last = jnp.logical_or(b == nb - 1, nxt != bucket_ref[b])

    u_all = jnp.concatenate(
        [ubase_ref[:] * scales_ref[j:j + 1, :] for j in range(num_p)],
        axis=0)
    contrib = jnp.dot(u_all, vband_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for s in range(slots):
        @pl.when((b % slots) == s)
        def _(s=s):
            acc_ref[s] += contrib

    @pl.when(last)
    def _():
        total = acc_ref[0]
        for s in range(1, slots):
            total = total + acc_ref[s]
        out_ref[:, 0] = total.reshape(num_p, WIN_ROWS,
                                      total.shape[-1])


@functools.partial(jax.jit, static_argnames=(
    "num_buckets", "lanes", "w_support", "block_v", "slots",
    "interpret"))
def grid_packed_parity(bucket_ids, ubase, vband, scales,
                       num_buckets: int, lanes: int, w_support: int,
                       block_v: int, slots: int,
                       interpret: bool = False):
    num_p = 2 * w_support
    total = vband.shape[0]
    num_blocks = total // block_v
    return pl.pallas_call(
        functools.partial(_grid_kernel_parity, num_p=num_p,
                          slots=slots),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((WIN_ROWS, block_v), lambda b, ids: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_v, lanes), lambda b, ids: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_p, block_v), lambda b, ids: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (num_p, 1, WIN_ROWS, lanes),
                lambda b, ids: (0, ids[b], 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((slots, num_p * WIN_ROWS, lanes),
                           jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_p, num_buckets, WIN_ROWS, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bucket_ids, ubase, vband, scales)


def _scenario(rows, chans, image=512):
    rng = np.random.default_rng(1)
    uvw = rng.uniform(-1, 1, (rows, 3))
    uvw[:, :2] *= 0.45 * image / 2 / 0.002
    uvw[:, 2] *= 1.5 * 100.0 * 4.0
    vis = (rng.standard_normal((rows, chans))
           + 1j * rng.standard_normal((rows, chans))
           ).astype(np.complex64)
    plan = plan_wstack(uvw, C_0, C_0 / (100 * chans), chans, image, 128,
                       0.002, 100.0, support=8, w_support=4,
                       w_tower_height=4.0)
    return plan, uvw, vis


def main():
    interpret = CHECK
    if CHECK:
        plan, uvw, vis = _scenario(256, 4, image=256)
    else:
        wait_for_chip()
        plan, uvw, vis = _scenario(16384, 256)
    pplan = plan_packed(plan, uvw, block_v=256)
    g = packed_gridder(pplan)
    vre, vim = g.sort(device_put(vis) if not CHECK else jnp.asarray(vis))
    scales_fn = jax.jit(lambda wkt, re, im: jnp.concatenate(
        [wkt * re[None, :], wkt * im[None, :]], axis=0))
    scales = scales_fn(g.wk_t, vre, vim)
    args = (g.block_bucket, g.ubase, g.vband, scales,
            pplan.num_buckets, plan.subgrid_size, plan.w_support)

    if CHECK:
        base = grid_packed_pallas(*args, block_v=pplan.block_v,
                                  interpret=True)
        par = grid_packed_parity(*args, block_v=pplan.block_v,
                                 slots=2, interpret=True)
        mask = np.asarray(g.visited).astype(bool)
        b = np.asarray(base)[:, mask]
        p = np.asarray(par)[:, mask]
        err = np.abs(p - b).max() / max(np.abs(b).max(), 1e-30)
        print(f"parity-split vs production (visited windows): "
              f"max rel diff {err:.2e}")
        assert err < 1e-6
        return

    red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                                   + jnp.float32(1e-6) * jnp.tanh(s)))
    nb = pplan.total // pplan.block_v
    for name, fn in (
            ("slots1 (production)",
             lambda sc: grid_packed_pallas(
                 g.block_bucket, g.ubase, g.vband, sc,
                 pplan.num_buckets, plan.subgrid_size, plan.w_support,
                 block_v=pplan.block_v)),
            ("slots2", lambda sc: grid_packed_parity(
                g.block_bucket, g.ubase, g.vband, sc,
                pplan.num_buckets, plan.subgrid_size, plan.w_support,
                block_v=pplan.block_v, slots=2)),
            ("slots4", lambda sc: grid_packed_parity(
                g.block_bucket, g.ubase, g.vband, sc,
                pplan.num_buckets, plan.subgrid_size, plan.w_support,
                block_v=pplan.block_v, slots=4)),
    ):
        sc = scales
        wins = fn(sc)
        _ = float(red(wins))
        for _loop in range(2):
            t0 = time.perf_counter()
            for _i in range(10):
                wins = fn(sc)
                sc = fb(sc, red(wins))
            _ = float(red(wins))
            dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt * 1e3:.2f} ms/call, "
              f"{dt / nb * 1e9:.0f} ns/block "
              f"({vis.size / dt / 1e6:.1f} Mvis/s kernel)", flush=True)


if __name__ == "__main__":
    main()
