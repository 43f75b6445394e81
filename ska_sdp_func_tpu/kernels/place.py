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


def _place_kernel(src0_ref, vcnt_ref, *refs, bv: int, n_ops: int):
    # refs = ins[n_ops], outs[n_ops], scratches[n_ops], sem
    ins = refs[:n_ops]
    outs = refs[n_ops:2 * n_ops]
    scr = refs[2 * n_ops:3 * n_ops]
    sem = refs[3 * n_ops]
    i = pl.program_id(0)
    s0 = src0_ref[i]
    vc = vcnt_ref[i]
    copies = [
        pltpu.make_async_copy(ins[j].at[pl.ds(s0, bv)], scr[j],
                              sem.at[j])
        for j in range(n_ops)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (bv,), 0)
    keep = lane < vc
    for j in range(n_ops):
        zero = jnp.zeros((), scr[j].dtype)
        outs[j][:] = jnp.where(keep, scr[j][:], zero)


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
    ops:   tuple of 1-D arrays, each of length ``N + bv`` — the
           key-sorted payload streams PADDED by ``bv`` (so a tail
           block's full-``bv`` copy stays in bounds). int32/f32 mix.
    Returns a tuple of ``[cap]`` placed arrays with invalid slots
    zeroed (matching the ``jnp.where(slot_ok, ...)`` semantics of the
    sort-based placement).
    """
    n_ops = len(ops)
    nblocks = cap // bv
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((bv,), lambda i, s0, vc: (i,))
    outs = pl.pallas_call(
        functools.partial(_place_kernel, bv=bv, n_ops=n_ops),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblocks,),
            in_specs=[any_spec] * n_ops,
            out_specs=[out_spec] * n_ops,
            scratch_shapes=(
                [pltpu.VMEM((bv,), o.dtype) for o in ops]
                + [pltpu.SemaphoreType.DMA((n_ops,))]),
        ),
        out_shape=[jax.ShapeDtypeStruct((cap,), o.dtype) for o in ops],
        interpret=interpret,
    )(src0, vcnt, *ops)
    return tuple(outs)
