"""Padded-stream placement via per-block dynamic-offset DMA.

The streaming device plan (:mod:`ska_sdp_func_tpu.parallel.streaming`)
must materialise the *placed* stream: the key-sorted entry stream with
each bucket's run padded to a multiple of ``block_v``. Until round 3
this was a second ``lax.sort`` (merge sort over ``N + cap`` keys),
measured at ~10 ms per payload operand at dense-chunk scale — the
single most expensive stage of the streaming step.

But placement is pure GAP INSERTION: because padded bucket regions are
multiples of ``block_v`` and buckets are contiguous in the sorted
stream, every ``block_v``-aligned output block is one CONTIGUOUS range
of the sorted entry stream::

    placed[i*bv : (i+1)*bv] = sorted[src0[i] : src0[i] + bv]

with the invalid tail masked to the fill value. ``src0``/``vcnt`` per
block follow from the bucket tables (``[num_blocks]``-scale
arithmetic, no entry-scale work). This kernel performs the insertion
with per-block async copies from HBM — a straight memcpy bound by HBM
bandwidth instead of a sorting network.

Mosaic constraint (measured on v5e): 1-D HBM slices must be
1024-element aligned in BOTH offset and size, so the copy cannot start
at the (arbitrary) ``src0``. Instead the stream is viewed as
``[rows, 128]``, each block DMAs the 8-row-aligned superset window
covering its range, and the ≤1023-element misalignment is fixed in
VMEM with two dynamic rotates (lanes, then sublanes) and a
row-boundary select — all VPU-register work, no extra memory traffic.

Reference analogue: the bucket-sorted tiling copy of
sdp_tiled_functions.cu (bucket_sort writes visibilities into tile
order); here the tile order is materialised by DMA from the already
key-sorted stream.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
_SUBL = 8
_TILE = _LANES * _SUBL  # 1024: 1-D HBM slice alignment granule (32-bit)


def _place_kernel(src0_ref, vcnt_ref, *refs, bvr: int, wr: int,
                  n_ops: int):
    # refs = ins[n_ops], outs[n_ops], scratches[n_ops], sem
    ins = refs[:n_ops]
    outs = refs[n_ops:2 * n_ops]
    scr = refs[2 * n_ops:3 * n_ops]
    sem = refs[3 * n_ops]
    i = pl.program_id(0)
    s0 = src0_ref[i]
    vc = vcnt_ref[i]
    r0 = s0 // _LANES
    a0 = pl.multiple_of((r0 // _SUBL) * _SUBL, _SUBL)
    q = r0 - a0            # sublane misalignment, 0..7 rows
    m = s0 - r0 * _LANES   # lane misalignment, 0..127
    copies = [
        pltpu.make_async_copy(ins[j].at[pl.ds(a0, wr)], scr[j],
                              sem.at[j])
        for j in range(n_ops)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (bvr, _LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bvr, _LANES), 0)
    keep = row * _LANES + lane < vc
    lo = lane < _LANES - m
    for j in range(n_ops):
        S = scr[j][:]
        # R[r, l] = S[r, (l + m) % 128]; Rq[k] = R[(k + q) % wr];
        # flat[s0 + 128k + l] = Rq[k, l] if l < 128 - m else Rq[k+1, l]
        R = pltpu.roll(S, (_LANES - m) % _LANES, 1)
        Rq = pltpu.roll(R, (wr - q) % wr, 0)
        Rq1 = pltpu.roll(Rq, wr - 1, 0)
        T = jnp.where(lo, Rq[:bvr], Rq1[:bvr])
        zero = jnp.zeros((), S.dtype)
        outs[j][:] = jnp.where(keep, T, zero)[None]


@functools.partial(jax.jit,
                   static_argnames=("bv", "cap", "interpret"))
def place_stream_pallas(src0, vcnt, ops, bv: int, cap: int,
                        interpret: bool = False):
    """Materialise the placed (padded) stream by gap-insertion DMA.

    src0:  [cap // bv] int32 — first sorted-entry index of each output
           block (clamped into ``[0, N]``; garbage allowed wherever
           ``vcnt <= 0``, e.g. filler blocks or an overflowed plan).
    vcnt:  [cap // bv] int32 — valid entries in each block; the tail
           of the block is zero-filled.
    ops:   tuple of 1-D arrays, each of length ``N`` — the key-sorted
           payload streams (int32/f32 mix; padding for the aligned
           superset windows is added here).
    ``bv`` must be a multiple of 128 (all production block_v are);
    ``cap`` a multiple of ``bv``.
    Returns a tuple of ``[cap]`` placed arrays with invalid slots
    zeroed (matching the ``jnp.where(slot_ok, ...)`` semantics of the
    sort-based placement).
    """
    if bv % _LANES != 0:
        raise ValueError(f"bv must be a multiple of {_LANES}, got {bv}")
    n_ops = len(ops)
    nblocks = cap // bv
    bvr = bv // _LANES
    # Superset window: worst-case 7-row + 127-lane misalignment ahead
    # of the bv payload, rounded to the 8-row DMA granule.
    wr = _SUBL * (-(-(bvr + _SUBL) // _SUBL))
    n = ops[0].shape[0]
    lpad = (-(-n // _TILE) + wr // _SUBL) * _TILE

    def pad2d(x):
        return jnp.concatenate(
            [x, jnp.zeros((lpad - n,), x.dtype)]).reshape(-1, _LANES)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((1, bvr, _LANES), lambda i, s0, vc: (i, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_place_kernel, bvr=bvr, wr=wr, n_ops=n_ops),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblocks,),
            in_specs=[any_spec] * n_ops,
            out_specs=[out_spec] * n_ops,
            scratch_shapes=(
                [pltpu.VMEM((wr, _LANES), o.dtype) for o in ops]
                + [pltpu.SemaphoreType.DMA((n_ops,))]),
        ),
        out_shape=[jax.ShapeDtypeStruct((nblocks, bvr, _LANES), o.dtype)
                   for o in ops],
        interpret=interpret,
    )(src0, vcnt, *(pad2d(o) for o in ops))
    return tuple(o.reshape(cap) for o in outs)
