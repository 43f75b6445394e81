"""Dot-formulation microbench for the packed grid kernel.

The 2026-08-19 block sweep (experiments/results/r3_queue_*.log) showed
the packed kernel is bound by a BLOCK-INDEPENDENT, stream-proportional
floor: f32 dots run at ~16 TFLOP/s (~50% of the 6-pass f32-HIGHEST MXU
peak) but bf16 reaches only ~25 of 197 TFLOP/s — the bf16 path is NOT
MXU-pass-bound. This experiment isolates the candidates per block
(B = block_v slots, lanes = 128, num_p = 8):

  prod        production math: VPU-build u_all = concat(ubase*scales_j)
              then ONE [128, B] @ [B, 128] HIGHEST dot.
  prod_bf16   production fast mode (vband streamed bf16, u_all cast,
              single-pass DEFAULT dot).
  lhs_stream  u_all prebuilt OUTSIDE the kernel and streamed [128, B]
              from HBM (trades +512 B/slot HBM for zero in-kernel VPU
              build) + the same single dot.
  lhs_stream_bf16  both operands prebuilt AND pre-cast bf16 (half the
              stream, zero in-kernel casts).
  ksplit4     u_all built in-kernel, dot split into 4 independent
              K-chunk dots summed at the end — tests whether Mosaic
              runs independent MXU issues in parallel.
  ksplit4_bf16
  nodot       u_all build + elementwise-sum reduction only (no MXU) —
              the non-dot floor.

Run on the real chip: ``python experiments/exp_dot.py``.
CPU sanity: ``EXP_CHECK=1 JAX_PLATFORMS=cpu python experiments/exp_dot.py``
(interpret mode, tiny shapes, parity of every variant vs prod).
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
)

NUM_P = 8
LANES = 128
M = NUM_P * WIN_ROWS          # 128


def _acc(out_ref, first, contrib):
    @pl.when(first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += contrib


def _first(bucket_ref):
    b = pl.program_id(0)
    prev = bucket_ref[jnp.maximum(b - 1, 0)]
    return jnp.logical_or(b == 0, prev != bucket_ref[b])


def _u_all(ubase_ref, scales_ref):
    return jnp.concatenate(
        [ubase_ref[:] * scales_ref[j:j + 1, :] for j in range(NUM_P)],
        axis=0)


def _k_prod(bucket_ref, ubase_ref, vband_ref, scales_ref, out_ref):
    u_all = _u_all(ubase_ref, scales_ref)
    vb = vband_ref[:]
    if vb.dtype == jnp.bfloat16:
        u_all = u_all.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = jax.lax.Precision.HIGHEST
    contrib = jnp.dot(u_all, vb, preferred_element_type=jnp.float32,
                      precision=prec)
    _acc(out_ref, _first(bucket_ref), contrib)


def _k_lhs_stream(bucket_ref, uall_ref, vband_ref, out_ref):
    u_all = uall_ref[:]
    vb = vband_ref[:]
    prec = (jax.lax.Precision.DEFAULT if vb.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    contrib = jnp.dot(u_all, vb, preferred_element_type=jnp.float32,
                      precision=prec)
    _acc(out_ref, _first(bucket_ref), contrib)


def _k_ksplit(bucket_ref, ubase_ref, vband_ref, scales_ref, out_ref,
              *, splits: int):
    u_all = _u_all(ubase_ref, scales_ref)
    vb = vband_ref[:]
    if vb.dtype == jnp.bfloat16:
        u_all = u_all.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = jax.lax.Precision.HIGHEST
    bv = vb.shape[0]
    step = bv // splits
    parts = [jnp.dot(u_all[:, i * step:(i + 1) * step],
                     vb[i * step:(i + 1) * step, :],
                     preferred_element_type=jnp.float32,
                     precision=prec)
             for i in range(splits)]
    contrib = parts[0]
    for p in parts[1:]:
        contrib = contrib + p
    _acc(out_ref, _first(bucket_ref), contrib)


def _k_npair(bucket_ref, ubase_ref, vband_ref, scales_ref, out_ref):
    """N-widened pair step: two consecutive blocks' windows side by
    side on the output lane axis — ONE [128, 2B] @ [2B, 256] dot whose
    RHS is built in-kernel by masking the streamed [2B, 128] v-band
    into its half (first B slots -> columns 0..127, rest -> 128..255).
    Tests whether the MXU pipelines two N-tiles per K-step (the
    per-K-pass cost would then halve vs two separate N=128 dots)."""
    u_all = _u_all(ubase_ref, scales_ref)           # [M, 2B]
    vb = vband_ref[:]                               # [2B, LANES]
    if vb.dtype == jnp.bfloat16:
        u_all = u_all.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = jax.lax.Precision.HIGHEST
    bv2 = vb.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bv2, 1), 0)
    lo = (rows < bv2 // 2).astype(vb.dtype)
    vb2 = jnp.concatenate([vb * lo, vb * (1 - lo)], axis=1)
    contrib = jnp.dot(u_all, vb2, preferred_element_type=jnp.float32,
                      precision=prec)               # [M, 2*LANES]
    _acc(out_ref, _first(bucket_ref), contrib)


def _k_nodot(bucket_ref, ubase_ref, vband_ref, scales_ref, out_ref):
    u_all = _u_all(ubase_ref, scales_ref)
    # [M, B] -> [M, LANES] cheap fold so the build can't be DCE'd:
    # sum groups of B//LANES columns (pure VPU reshape-reduce).
    bv = u_all.shape[1]
    contrib = (u_all.reshape(M, bv // LANES, LANES).sum(axis=1)
               + vband_ref[0:1, :].astype(jnp.float32))
    _acc(out_ref, _first(bucket_ref), contrib)


def _call(kernel, bucket_ids, ins, block_v, num_buckets,
          lhs_streamed: bool, interpret: bool):
    nb = ins[1].shape[0] // block_v if lhs_streamed else \
        ins[0].shape[1] // block_v
    first_rows = M if lhs_streamed else WIN_ROWS
    specs = [
        pl.BlockSpec((first_rows, block_v), lambda b, ids: (0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_v, LANES), lambda b, ids: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not lhs_streamed:
        specs.append(pl.BlockSpec((NUM_P, block_v),
                                  lambda b, ids: (0, b),
                                  memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=specs,
            out_specs=pl.BlockSpec((M, LANES),
                                   lambda b, ids: (ids[b], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_buckets * M, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bucket_ids, *ins)


def _call_npair(bucket_ids, ins, block_v, num_buckets, interpret):
    """Pair-step harness: grid step s covers blocks 2s, 2s+1; output
    block = [M, 2*LANES] at the pair's (first) bucket id row."""
    nb = ins[0].shape[1] // block_v
    ns = nb // 2
    ids2 = bucket_ids[::2]
    return pl.pallas_call(
        _k_npair,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ns,),
            in_specs=[
                pl.BlockSpec((WIN_ROWS, 2 * block_v),
                             lambda s, ids: (0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * block_v, LANES),
                             lambda s, ids: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NUM_P, 2 * block_v),
                             lambda s, ids: (0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, 2 * LANES),
                                   lambda s, ids: (ids[s], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_buckets * M, 2 * LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(ids2, *ins)


def _jit_call(kernel, block_v, num_buckets, lhs_streamed, interpret):
    """Jitted wrapper — eager pallas_call pays ~150 µs/call of
    op-by-op dispatch (measured 2026-08-19: the whole un-jitted sweep
    ran ~50x slower than the production kernel), so every timed
    variant must run under jax.jit like production does."""
    @jax.jit
    def f(bucket_ids, *ins):
        return _call(kernel, bucket_ids, ins, block_v, num_buckets,
                     lhs_streamed, interpret)
    return f


def _jit_call_npair(block_v, num_buckets, interpret):
    @jax.jit
    def f(bucket_ids, *ins):
        return _call_npair(bucket_ids, ins, block_v, num_buckets,
                           interpret)
    return f


def main():
    interpret = CHECK
    if CHECK:
        block_v, nb, blocks_per_bucket = 128, 8, 2
    else:
        wait_for_chip()
        # nb=4096 OOM'd once jitted (ubase+vband+scales+uall+bf16
        # copies ~7 GB before jit temporaries); half scale keeps the
        # same per-block statistics at ~3.5 GB resident.
        block_v, nb, blocks_per_bucket = 1024, 2048, 8
    total = block_v * nb
    num_buckets = nb // blocks_per_bucket
    rng = np.random.default_rng(0)
    ubase = jnp.asarray(rng.standard_normal((WIN_ROWS, total)),
                        jnp.float32)
    vband = jnp.asarray(rng.standard_normal((total, LANES)),
                        jnp.float32)
    scales = jnp.asarray(rng.standard_normal((NUM_P, total)),
                         jnp.float32)
    bucket_ids = jnp.asarray(np.arange(nb) // blocks_per_bucket,
                             np.int32)

    build_uall = jax.jit(lambda ub, sc: jnp.concatenate(
        [ub * sc[j:j + 1] for j in range(NUM_P)], axis=0))
    uall = build_uall(ubase, scales)

    flop_per_slot = 2 * M * LANES

    def run(name, fn, feed):
        out = fn()
        if CHECK:
            return np.asarray(out)
        red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
        _ = float(red(out))
        for _loop in range(2):
            t0 = time.perf_counter()
            for _i in range(10):
                out = fn()
                feed(red(out))
            _ = float(red(out))
            dt = (time.perf_counter() - t0) / 10
        tf = total * flop_per_slot / dt / 1e12
        print(f"{name:18s}: {dt * 1e3:6.2f} ms  "
              f"{dt / nb * 1e9:6.0f} ns/block  "
              f"{dt / total * 1e9:5.2f} ns/slot  {tf:5.1f} TFLOP/s",
              flush=True)
        return None

    state = {"scales": scales, "uall": uall,
             "uall16": uall.astype(jnp.bfloat16),
             "vband16": vband.astype(jnp.bfloat16)}
    fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                                   + jnp.float32(1e-6) * jnp.tanh(s)))
    fb16 = jax.jit(lambda v, s: (v.astype(jnp.float32)
                                 * (jnp.float32(1.0) + jnp.float32(1e-6)
                                    * jnp.tanh(s))).astype(jnp.bfloat16))

    def feed_scales(s):
        state["scales"] = fb(state["scales"], s)

    def feed_uall(s):
        state["uall"] = fb(state["uall"], s)

    def feed_uall16(s):
        state["uall16"] = fb16(state["uall16"], s)

    f_prod = _jit_call(_k_prod, block_v, num_buckets, False, interpret)
    f_lhs = _jit_call(_k_lhs_stream, block_v, num_buckets, True,
                      interpret)
    f_nodot = _jit_call(_k_nodot, block_v, num_buckets, False,
                        interpret)
    f_npair = _jit_call_npair(block_v, num_buckets, interpret)
    f_ks = {s: _jit_call(functools.partial(_k_ksplit, splits=s),
                         block_v, num_buckets, False, interpret)
            for s in (2, 4)}

    results = {}
    results["prod"] = run(
        "prod", lambda: f_prod(bucket_ids, ubase, vband,
                               state["scales"]), feed_scales)
    results["prod_bf16"] = run(
        "prod_bf16", lambda: f_prod(bucket_ids, ubase,
                                    state["vband16"],
                                    state["scales"]), feed_scales)
    results["lhs_stream"] = run(
        "lhs_stream", lambda: f_lhs(bucket_ids, state["uall"], vband),
        feed_uall)
    results["lhs_stream_bf16"] = run(
        "lhs_stream_bf16", lambda: f_lhs(bucket_ids, state["uall16"],
                                         state["vband16"]),
        feed_uall16)
    for splits in (2, 4):
        results[f"ksplit{splits}"] = run(
            f"ksplit{splits}",
            lambda splits=splits: f_ks[splits](
                bucket_ids, ubase, vband, state["scales"]),
            feed_scales)
        results[f"ksplit{splits}_bf16"] = run(
            f"ksplit{splits}_bf16",
            lambda splits=splits: f_ks[splits](
                bucket_ids, ubase, state["vband16"], state["scales"]),
            feed_scales)
    results["npair"] = run(
        "npair", lambda: f_npair(bucket_ids, ubase, vband,
                                 state["scales"]), feed_scales)
    results["npair_bf16"] = run(
        "npair_bf16", lambda: f_npair(bucket_ids, ubase,
                                      state["vband16"],
                                      state["scales"]), feed_scales)
    results["nodot"] = run(
        "nodot", lambda: f_nodot(bucket_ids, ubase, vband,
                                 state["scales"]), feed_scales)

    if CHECK:
        base = results["prod"]
        # npair semantics: pair step s adds block 2s's contribution to
        # columns 0..127 and block 2s+1's to 128..255 of the pair's
        # (first) bucket row — with blocks_per_bucket even, summing
        # the halves reproduces the per-bucket windows.
        npair = results["npair"]
        folded = npair[:, :LANES] + npair[:, LANES:]
        err = np.abs(folded - base).max() / np.abs(base).max()
        print(f"npair (halves summed) vs prod: max rel diff {err:.2e}")
        assert err < 1e-5
        for name in ("lhs_stream", "ksplit2", "ksplit4"):
            err = np.abs(results[name] - base).max() / np.abs(base).max()
            print(f"{name} vs prod: max rel diff {err:.2e}")
            assert err < 1e-5, name
        for name in ("prod_bf16", "lhs_stream_bf16",
                     "ksplit2_bf16", "ksplit4_bf16"):
            err = np.abs(results[name] - base).max() / np.abs(base).max()
            print(f"{name} vs prod: max rel diff {err:.2e}")
            assert err < 0.05, name
        assert results["nodot"] is not None
        print("CPU parity OK")


if __name__ == "__main__":
    main()
