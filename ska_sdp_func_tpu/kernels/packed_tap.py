"""Packed bucket-blocked Pallas kernels for the w-towers inner tap.

Round-2 performance formulation. The all-layer banded-matmul kernels
(:mod:`.pallas_tap`) pay ``2 * N^2`` MXU FLOPs per visibility per
touched (layer, re/im) plane because every dot spans all ``N`` u-rows
of the subgrid while a visibility only touches ``support`` of them.
Here visibilities are pre-sorted into **buckets** keyed by
``(task, w-slab k0, u-octet g)``:

* every visibility in a bucket writes the same aligned 16-row window
  ``u in [8g, 8g+16)`` of the same ``w_support`` absolute layers
  ``k0 .. k0+w_support-1``;
* the ``2*w_support`` (layer, re/im) scale variants are stacked on the
  matmul's M dimension, so each block of ``block_v`` visibilities is
  ONE full-shape MXU dot ``[2*w_support*16, B] @ [B, N]`` — for the
  standard (support=8, w_support=4) geometry ``[128, B] @ [B, 128]``,
  ~10x fewer FLOPs per visibility than the dense formulation;
* the output window rides the Pallas pipeline: consecutive grid steps
  of the same bucket accumulate in VMEM and the window is DMA-flushed
  once per bucket — no dynamic-offset read-modify-writes (the ~500
  cycle/vis cost that capped the round-1 per-visibility prototype);
* the tap *bands* (u-taps placed at their sublane offset, v-taps
  placed at their lane offset) depend only on the static uvw geometry,
  so they are built **once per plan** by :func:`build_bands` and
  streamed into the kernel (~600 B/vis HBM, fully overlapped by the
  Pallas input pipeline) instead of being rebuilt from compare chains
  every call — measured 2.1x on the attached v5e-class chip
  (in-kernel build 78 Mvis/s -> streamed 165-175 Mvis/s real).

Bucket windows are folded into (or cut out of) the ``[K, N, N]``
absolute-layer stack by pure-reshape XLA passes in
:mod:`ska_sdp_func_tpu.parallel.packed`.

Row layout of a window (M = 2*w_support*16 rows, ``lanes`` columns):
row ``j*16 + r`` holds (re if j < w_support else im) of layer
``k0 + (j % w_support)`` at grid row ``u = 8g + r``.

Timing note: on tunnelled attachments ``block_until_ready`` returns
before pipelined chains complete — benchmark with a device->host
readback of a reduction over the final output (see bench.py).

Reference CUDA equivalent: the per-row atomicAdd scatter
(sdp_gridder_wtower_uvw.cu:129-241); the TPU version replaces atomics
with bucket-sorted dense accumulation (the reference's own bucket-sort
tiling idea, sdp_tiled_functions.cu, fused into the kernel schedule).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

WIN_ROWS = 16             # 8-aligned octet base + support (<= 8)
_VMEM_LIMIT = 100 * 1024 * 1024
PREP_G = 1024             # stream-prep granule (native 1-D lane tile)


def split_bf16(x):
    """bf16 hi/lo decomposition robust to excess-precision folding.

    The naive ``x - f32(bf16(x))`` is ELIDED to zero both under the
    attachment's --xla_allow_excess_precision=true and by LLVM on the
    CPU backend (measured: the lo half collapses and "high" degrades
    to bf16-class 1e-3 error). Round the upper 16 bits to
    nearest-even explicitly instead; the subtraction is then plain
    f32 arithmetic nothing can fold away.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)
    hi_f = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    lo = x - hi_f
    return hi_f.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _precision(fast: bool):
    return jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("lanes",))
def build_bands(u_off, iv0, uk, vk, lanes: int):
    """Static per-plan tap bands (one-time XLA pass, ~f32 compare
    chains; the result is reused by every grid/degrid call).

    u_off: [V] int32 in [0, 8); iv0: [V] int32; uk/vk: [V, support].
    Returns (ubase [16, V], vband [V, lanes], vband_t [lanes, V]),
    f32: ``ubase[r, p] = uk[p, r - u_off[p]]``, ``vband[p, c] =
    vk[p, c - iv0[p]]`` (zero outside the support window).
    ``vband_t`` is the degrid kernel's stream: with the v-taps on
    sublanes every degrid contraction is a standard (untransposed)
    MXU matmul — measured 1.6x over the lane-reduce formulation.
    """
    support = uk.shape[1]
    uk = uk.astype(jnp.float32)
    vk = vk.astype(jnp.float32)
    col = jnp.arange(lanes, dtype=jnp.int32)[None, :]
    vband = jnp.zeros((u_off.shape[0], lanes), jnp.float32)
    for s in range(support):
        vband = vband + jnp.where(col == iv0[:, None] + s,
                                  vk[:, s:s + 1], 0.0)
    row = jnp.arange(WIN_ROWS, dtype=jnp.int32)[:, None]
    ubase = jnp.zeros((WIN_ROWS, u_off.shape[0]), jnp.float32)
    for s in range(support):
        ubase = ubase + jnp.where(row == u_off[None, :] + s,
                                  uk[:, s][None, :], 0.0)
    return ubase, vband, vband.T


def _grid_kernel(bucket_ref, ubase_ref, vband_ref, scales_ref, out_ref,
                 *, num_p: int, precision):
    b = pl.program_id(0)
    # First step of this bucket's contiguous run -> overwrite (zero-init).
    prev = bucket_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != bucket_ref[b])

    # Stack the 2*w_support (layer, re/im) scale variants on M.
    u_all = jnp.concatenate(
        [ubase_ref[:] * scales_ref[j:j + 1, :] for j in range(num_p)],
        axis=0)
    _grid_accumulate(u_all, vband_ref, out_ref, first, num_p,
                     precision)


def _grid_accumulate(u_all, vband_ref, out_ref, first, num_p: int,
                     precision):
    # fast mode: the v-band streams in as bf16 (half the dominant HBM
    # stream) and the dot runs single-pass bf16 x bf16 -> f32 on the
    # MXU (842 vs 1229 ns/block measured; ~2e-3 kernel accuracy).
    if vband_ref.dtype == jnp.bfloat16:
        u_all = u_all.astype(jnp.bfloat16)
    contrib = jnp.dot(u_all, vband_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=precision)
    # Window rows regrouped (num_p, 16): the (layer, re/im)-major out
    # array layout makes the driver-side folds pure reshapes (the
    # bucket-major layout needed 1.8 GB transposes at 1024^2 scale).
    contrib = contrib.reshape(num_p, WIN_ROWS, contrib.shape[-1])

    @pl.when(first)
    def _():
        out_ref[:, 0] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:, 0] += contrib


def _stack_accumulate(out_ref, contrib, k0, g8, w_support: int,
                      sub_pad: int):
    """Accumulate a block's [2*w_support*16, lanes] contribution into
    the task's resident tower stack at its (layer, u-octet) offsets.

    ``out_ref`` block: (1, 2, num_layers*sub_pad, lanes) — re/im
    planes of the task's full tower, u rows padded by 8 for the last
    octet's overhang.  All offsets are multiples of 8 sublanes
    (sub_pad = lanes + 8 is 8-aligned, g8 = 8*octet), so the dynamic
    stores hit clean tile boundaries.  Shared by the band and fused
    stack kernels (v3: per-task stacks flushed once per task replace
    per-bucket 16-row windows + the driver fold pass — the dominant
    fixed HBM cost of the whole-image driver).
    """
    for j in range(w_support):
        off = (k0 + j) * sub_pad + g8
        for half, base in ((0, j), (1, w_support + j)):
            idx = (0, half, pl.ds(off, WIN_ROWS), slice(None))
            strip = contrib[base * WIN_ROWS:(base + 1) * WIN_ROWS]
            out_ref[idx] += strip


def _grid_stack_kernel_split(t_ref, k_ref, g_ref, ubase_ref,
                             vband_ref, wkt_ref, vre_ref, vim_ref,
                             out_ref, *, num_p: int, sub_pad: int,
                             precision):
    """Band-stream grid kernel with per-task stack accumulation
    (v3 output form of :func:`_grid_kernel_split`)."""
    b = pl.program_id(0)
    prev = t_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != t_ref[b])

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sw = num_p // 2
    wk = wkt_ref[:]                                  # [Sw, bv]
    vre = vre_ref[0, :]
    vim = vim_ref[0, :]
    u_all = jnp.concatenate(
        [ubase_ref[:] * (wk[j] * vre)[None, :] for j in range(sw)]
        + [ubase_ref[:] * (wk[j] * vim)[None, :] for j in range(sw)],
        axis=0)
    if vband_ref.dtype == jnp.bfloat16:
        u_all = u_all.astype(jnp.bfloat16)
    contrib = jnp.dot(u_all, vband_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=precision)
    _stack_accumulate(out_ref, contrib, k_ref[b], g_ref[b] * 8, sw,
                      sub_pad)


def _grid_stack_kernel_split_high(t_ref, k_ref, g_ref, ubase_ref,
                                  vbh_ref, vbl_ref, wkt_ref, vre_ref,
                                  vim_ref, out_ref, *, num_p: int,
                                  sub_pad: int):
    """Band-stream grid kernel, "high" precision: the v-band streams
    pre-split as bf16 hi/lo halves (same 4 B/lane as f32) and the
    scale stack splits in VMEM — three SINGLE-PASS bf16 MXU dots with
    f32 accumulate replace the multi-pass native-f32 HIGHEST dot.
    De-biased MXU peaks (BENCH_r05 probes): bf16 ~161 TF/s vs f32
    HIGHEST 29.6 — three bf16 passes are ~1.8x the native f32 mode at
    ~1.4e-6 taper-weighted accuracy (two orders inside the f32 path's
    2.5e-4 oracle envelope). The dropped lo@lo term is ~2^-18
    relative."""
    b = pl.program_id(0)
    prev = t_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != t_ref[b])

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sw = num_p // 2
    wk = wkt_ref[:]
    vre = vre_ref[0, :]
    vim = vim_ref[0, :]
    u_all = jnp.concatenate(
        [ubase_ref[:] * (wk[j] * vre)[None, :] for j in range(sw)]
        + [ubase_ref[:] * (wk[j] * vim)[None, :] for j in range(sw)],
        axis=0)
    u_hi, u_lo = split_bf16(u_all)
    d = functools.partial(jnp.dot,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    contrib = (d(u_hi, vbh_ref[:])
               + (d(u_hi, vbl_ref[:]) + d(u_lo, vbh_ref[:])))
    _stack_accumulate(out_ref, contrib, k_ref[b], g_ref[b] * 8, sw,
                      sub_pad)


@functools.partial(jax.jit, static_argnames=(
    "num_tasks", "num_layers", "lanes", "w_support", "block_v",
    "fast", "interpret"))
def grid_packed_stack_pallas(t_idx, k_idx, g_idx, ubase, vband,
                             scales, num_tasks: int, num_layers: int,
                             lanes: int, w_support: int,
                             block_v: int = 128, fast: bool = False,
                             interpret: bool = False) -> Array:
    """Band-stream packed gridding, v3 per-task stack output.

    Same streams as :func:`grid_packed_pallas` (split-scales form
    only) but accumulates whole per-task tower stacks in VMEM and
    flushes each ONCE — deleting the per-bucket window array and the
    driver fold pass (~250 MB of window write+read per 1M-vis
    whole-image call).  Requires blocks sorted task-major (the packed
    plan's (task, slab, octet) bucket order).  Returns
    ``[num_tasks, 2, num_layers*(lanes+8), lanes]`` f32 (rows
    ``[lanes:lanes+8)`` of each layer always zero).
    """
    num_p = 2 * w_support
    high = isinstance(vband, (tuple, list))
    total = (vband[0] if high else vband).shape[0]
    num_blocks = total // block_v
    sub_pad = lanes + 8
    wk_t, vre, vim = scales
    vb_spec = pl.BlockSpec((block_v, lanes),
                           lambda b, t, k, g: (b, 0),
                           memory_space=pltpu.VMEM)
    if high:
        # "high": vband pre-split into bf16 hi/lo halves (same bytes
        # as f32); three single-pass bf16 dots with f32 accumulate.
        kern = functools.partial(_grid_stack_kernel_split_high,
                                 num_p=num_p, sub_pad=sub_pad)
        vb_specs = [vb_spec, vb_spec]
        vb_ops = tuple(vband)
    else:
        kern = functools.partial(_grid_stack_kernel_split,
                                 num_p=num_p, sub_pad=sub_pad,
                                 precision=_precision(fast))
        vb_specs = [vb_spec]
        vb_ops = (vband,)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((WIN_ROWS, block_v),
                             lambda b, t, k, g: (0, b),
                             memory_space=pltpu.VMEM),
            ] + vb_specs + [
                pl.BlockSpec((w_support, block_v),
                             lambda b, t, k, g: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_v), lambda b, t, k, g: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_v), lambda b, t, k, g: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 2, num_layers * sub_pad, lanes),
                lambda b, t, k, g: (t[b], 0, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_tasks, 2, num_layers * sub_pad, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(t_idx, k_idx, g_idx, ubase, *vb_ops, wk_t,
      vre.reshape(1, total), vim.reshape(1, total))


def _grid_kernel_split(bucket_ref, ubase_ref, vband_ref, wkt_ref,
                       vre_ref, vim_ref, out_ref, *, num_p: int,
                       precision):
    """Grid kernel with the scale stack built IN VMEM from the w-tap
    stream and the visibility planes: streams 24 B/slot (wk_t 16 +
    vre/vim 8) instead of the 32 B/slot pre-built ``scales`` AND
    deletes the per-call XLA scale pass (another ~56 B/slot of HBM) —
    the band kernel is bandwidth-bound (397.7 Mvis/s at the measured
    238 GB/s triad, 2026-08-20), so bytes are time.  Same math, same
    accumulation order as :func:`_grid_kernel` (scales_j = wk[j %% Sw]
    * re/im(vis))."""
    b = pl.program_id(0)
    prev = bucket_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != bucket_ref[b])
    sw = num_p // 2
    wk = wkt_ref[:]                                  # [Sw, bv]
    vre = vre_ref[0, :]
    vim = vim_ref[0, :]
    u_all = jnp.concatenate(
        [ubase_ref[:] * (wk[j] * vre)[None, :] for j in range(sw)]
        + [ubase_ref[:] * (wk[j] * vim)[None, :] for j in range(sw)],
        axis=0)
    _grid_accumulate(u_all, vband_ref, out_ref, first, num_p,
                     precision)


def _degrid_tail(t_T, ubase, wk, out_ref, w_support: int):
    """Shared tail of the degrid math after the big window
    contraction: scale by the (u-tap x w-tap) stack and select the
    re/im halves into the wide [8, B] output block."""
    half = w_support * WIN_ROWS
    uwh = jnp.concatenate(
        [ubase * wk[layer:layer + 1, :]
         for layer in range(w_support)], axis=0)       # [half, B]
    prod = jnp.concatenate([uwh, uwh], axis=0) * t_T
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * half), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * half), 1)
    sel = jnp.where((rows == 0) & (cols < half), 1.0,
                    jnp.where((rows == 1) & (cols >= half), 1.0, 0.0)
                    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(sel, prod,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def _degrid_math(win, ubase, vbt, wk, out_ref,
                 w_support: int, precision):
    # All-standard-matmul formulation (no transposed operands, no VPU
    # lane reduces — measured 870 ns/block vs 1378 for the
    # contraction-64 + lane-reduce form on the v5e-class chip):
    #   t_T[j16r, b]  = sum_c win[j16r, c] * vband_t[c, b]   (MXU)
    #   prod          = uw2 * t_T        (u-taps x w-taps stack, VPU)
    #   out[i, b]     = sum_j S[i, j] * prod[j, b]           (MXU)
    # fast mode (bf16 vband_t stream): single-pass bf16 dot for the
    # big contraction; the tiny selection dot stays f32.
    if vbt.dtype == jnp.bfloat16:
        win = win.astype(jnp.bfloat16)
    t_T = jnp.dot(win, vbt,
                  preferred_element_type=jnp.float32,
                  precision=precision)                 # [2*half, B]
    _degrid_tail(t_T, ubase, wk, out_ref, w_support)


def _degrid_math_high(win, ubase, vbt_hi, vbt_lo, wk, out_ref,
                      w_support: int):
    """"High" mode: window split in VMEM, vband_t streamed pre-split —
    three single-pass bf16 dots with f32 accumulate (see
    _grid_stack_kernel_split_high)."""
    w_hi, w_lo = split_bf16(win)
    d = functools.partial(jnp.dot,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    t_T = d(w_hi, vbt_hi) + (d(w_hi, vbt_lo) + d(w_lo, vbt_hi))
    _degrid_tail(t_T, ubase, wk, out_ref, w_support)


@functools.partial(jax.jit, static_argnames=(
    "num_buckets", "lanes", "w_support", "block_v", "fast", "interpret"))
def grid_packed_pallas(bucket_ids, ubase, vband, scales,
                       num_buckets: int, lanes: int, w_support: int,
                       block_v: int = 128, fast: bool = False,
                       interpret: bool = False) -> Array:
    """Packed gridding: bucket-sorted scaled bands -> window stack.

    All per-visibility arrays are pre-sorted and pre-padded so that
    block ``b`` (``block_v`` entries) belongs entirely to bucket
    ``bucket_ids[b]`` and buckets occupy contiguous block runs.

    bucket_ids: [NB] int32; ubase: [16, V]; vband: [V, lanes];
    scales: EITHER the pre-built [2*w_support, V] f32 scale stack
    (w-tap * re/im(vis), zero for padded or invalid entries) OR a
    tuple ``(wk_t [Sw, V], vre [V], vim [V])`` — the split form
    builds the stack in VMEM, streaming 24 B/slot instead of 32 and
    deleting the per-call XLA scale pass (the kernel is
    bandwidth-bound; see :func:`_grid_kernel_split`).
    Returns [2*w_support, num_buckets, 16, lanes]
    f32 windows ((layer, re/im)-major so driver folds are reshapes;
    NaN/garbage in never-visited buckets — mask the fold with the
    plan's visited mask via ``jnp.where``, not multiply).
    """
    num_p = 2 * w_support
    total = vband.shape[0]
    num_blocks = total // block_v
    split = isinstance(scales, (tuple, list))

    if split:
        wk_t, vre, vim = scales
        kern = functools.partial(_grid_kernel_split, num_p=num_p,
                                 precision=_precision(fast))
        extra_specs = [
            pl.BlockSpec((w_support, block_v), lambda b, ids: (0, b),
                         memory_space=pltpu.VMEM),
            # 1-D vis streams blocked along lanes ([1, total] view:
            # Mosaic's block-shape rule, see fused_tap).
            pl.BlockSpec((1, block_v), lambda b, ids: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda b, ids: (0, b),
                         memory_space=pltpu.VMEM),
        ]
        extra_ops = (wk_t, vre.reshape(1, total),
                     vim.reshape(1, total))
    else:
        kern = functools.partial(_grid_kernel, num_p=num_p,
                                 precision=_precision(fast))
        extra_specs = [
            pl.BlockSpec((num_p, block_v), lambda b, ids: (0, b),
                         memory_space=pltpu.VMEM),
        ]
        extra_ops = (scales,)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((WIN_ROWS, block_v), lambda b, ids: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_v, lanes), lambda b, ids: (b, 0),
                             memory_space=pltpu.VMEM),
            ] + extra_specs,
            out_specs=pl.BlockSpec(
                (num_p, 1, WIN_ROWS, lanes),
                lambda b, ids: (0, ids[b], 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_p, num_buckets, WIN_ROWS, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bucket_ids, ubase, vband, *extra_ops)


def _clenshaw_rows(x, c):
    """Clenshaw over support-major rows: x [1, B] or [B] -> taps
    [S, B] (c: [degree+1, S] in VMEM; supports land on sublanes)."""
    b1 = jnp.zeros((c.shape[1],) + x.shape[-1:], jnp.float32)
    b2 = jnp.zeros_like(b1)
    for k in range(c.shape[0] - 1, 0, -1):
        b1, b2 = c[k][:, None] + 2.0 * x * b1 - b2, b1
    return c[0][:, None] + x * b1 - b2


def _clenshaw_cols(x, c):
    """Clenshaw over support-minor columns: x [B, 1] -> taps [B, S]."""
    b1 = jnp.zeros(x.shape[:-1] + (c.shape[1],), jnp.float32)
    b2 = jnp.zeros_like(b1)
    for k in range(c.shape[0] - 1, 0, -1):
        b1, b2 = c[k][None, :] + 2.0 * x * b1 - b2, b1
    return c[0][None, :] + x * b1 - b2


def _stream_prep_grid_kernel(c_uv_ref, c_w_ref, u_off_ref, u_frac_ref,
                             w_row_ref, vre_ref, vim_ref, iv0c_ref,
                             vfc_ref, ubase_ref, vband_ref, scales_ref,
                             *, inv2_ov, inv2_wov, support: int,
                             w_support: int, lanes: int, fast: bool):
    bv = u_off_ref.shape[0]
    c_uv, c_w = c_uv_ref[:], c_w_ref[:]
    xu = inv2_ov * u_frac_ref[:].astype(jnp.float32) - 1.0   # [bv]
    uk = _clenshaw_rows(xu, c_uv)                            # [S, bv]
    xw = inv2_wov * w_row_ref[:].astype(jnp.float32) - 1.0
    wk = _clenshaw_rows(xw, c_w)                             # [Sw, bv]

    row16 = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, bv), 0)
    uo = u_off_ref[:]
    ub = jnp.zeros((WIN_ROWS, bv), jnp.float32)
    for s in range(support):
        ub = jnp.where(row16 == uo + s, uk[s], ub)
    ubase_ref[:] = ub

    scales_ref[:] = jnp.concatenate(
        [wk * vre_ref[:], wk * vim_ref[:]], axis=0)

    xv = inv2_ov * vfc_ref[:].astype(jnp.float32) - 1.0      # [bv, 1]
    vk = _clenshaw_cols(xv, c_uv)                            # [bv, S]
    col = jax.lax.broadcasted_iota(jnp.int32, (bv, lanes), 1)
    iv = iv0c_ref[:]                                         # [bv, 1]
    vb = jnp.zeros((bv, lanes), jnp.float32)
    for s in range(support):
        vb = jnp.where(col == iv + s, vk[:, s:s + 1], vb)
    vband_ref[:] = vb.astype(jnp.bfloat16) if fast else vb


def stream_prep_grid_pallas(u_off, u_frac, v_frac, w_row, vre_s, vim_s,
                            iv0, uv_coeffs, w_coeffs,
                            oversampling: int, w_oversampling: int,
                            support: int, w_support: int, lanes: int,
                            block_v: int, fast: bool = False,
                            interpret: bool = False):
    """Fused per-chunk grid prep: placed plan -> (ubase, vband, scales)
    in ONE pass over the stream.

    The XLA formulation (Chebyshev taps + 8-way compare-select band
    build + scale concat) runs each stage as its own HBM pass over the
    GB-scale band arrays (~70 ms at 5.9M slots on-chip); here each
    block builds everything in VMEM and the cost is the output
    write bandwidth. Padding/invalid slots carry zero visibilities, so
    their (garbage-tap) contributions vanish in the kernel's
    ``ubase * scales`` product.

    u_off/u_frac/w_row/iv0: [cap] int32 (placed); vre_s/vim_s: [cap]
    f32 (placed, zero on invalid slots). Returns ubase [16, cap] f32,
    vband [cap, lanes] (bf16 in fast mode), scales [2*w_support, cap].
    """
    cap = u_off.shape[0]
    num_p = 2 * w_support
    # The prep granule is independent of the gridding block size:
    # 1-D operands must block in multiples of the native T(1024) lane
    # tile, and a bigger granule amortises the grid-step overhead.
    # plan_stream rounds cap to a PREP_G multiple.
    g = PREP_G
    if cap % g:
        raise ValueError(
            f"stream capacity {cap} not a multiple of {g}")
    num_g = cap // g
    c_uv = np.asarray(uv_coeffs, np.float32)
    c_w = np.asarray(w_coeffs, np.float32)
    # iv0/v_frac ride as column operands (sublane-major) for the band
    # build; u-side quantities stay lane-major.
    iv0c = iv0.reshape(cap, 1)
    vfc = v_frac.reshape(cap, 1)

    cspec_uv = pl.BlockSpec(c_uv.shape, lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    cspec_w = pl.BlockSpec(c_w.shape, lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _stream_prep_grid_kernel,
            inv2_ov=np.float32(2.0 / oversampling),
            inv2_wov=np.float32(2.0 / w_oversampling),
            support=support, w_support=w_support, lanes=lanes,
            fast=fast),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(num_g,),
            in_specs=[cspec_uv, cspec_w] + [
                pl.BlockSpec((g,), lambda b: (b,),
                             memory_space=pltpu.VMEM)
                for _ in range(5)          # u_off/u_frac/w_row/vre/vim
            ] + [
                pl.BlockSpec((g, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),   # iv0 col
                pl.BlockSpec((g, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),   # v_frac col
            ],
            out_specs=[
                pl.BlockSpec((WIN_ROWS, g), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, lanes), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_p, g), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((WIN_ROWS, cap), jnp.float32),
            jax.ShapeDtypeStruct(
                (cap, lanes),
                jnp.bfloat16 if fast else jnp.float32),
            jax.ShapeDtypeStruct((num_p, cap), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c_uv, c_w, u_off, u_frac, w_row, vre_s, vim_s, iv0c, vfc)


def _stream_prep_degrid_kernel(c_uv_ref, c_w_ref, u_off_ref,
                               u_frac_ref, v_frac_ref, w_row_ref,
                               valid_ref, iv0_ref, ubase_ref, vbt_ref,
                               wkt_ref, *, inv2_ov, inv2_wov,
                               support: int, w_support: int,
                               lanes: int, fast: bool):
    bv = u_off_ref.shape[0]
    c_uv, c_w = c_uv_ref[:], c_w_ref[:]
    xu = inv2_ov * u_frac_ref[:].astype(jnp.float32) - 1.0
    uk = _clenshaw_rows(xu, c_uv)
    xw = inv2_wov * w_row_ref[:].astype(jnp.float32) - 1.0
    wk = _clenshaw_rows(xw, c_w)
    wkt_ref[:] = wk * valid_ref[:]

    row16 = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, bv), 0)
    uo = u_off_ref[:]
    ub = jnp.zeros((WIN_ROWS, bv), jnp.float32)
    for s in range(support):
        ub = jnp.where(row16 == uo + s, uk[s], ub)
    ubase_ref[:] = ub

    # vband_t is lane-major throughout (lanes on sublanes, vis on
    # lanes) — no column operands needed.
    xv = inv2_ov * v_frac_ref[:].astype(jnp.float32) - 1.0
    vk = _clenshaw_rows(xv, c_uv)                      # [S, bv]
    rowL = jax.lax.broadcasted_iota(jnp.int32, (lanes, bv), 0)
    iv = iv0_ref[:]
    vbt = jnp.zeros((lanes, bv), jnp.float32)
    for s in range(support):
        vbt = jnp.where(rowL == iv + s, vk[s], vbt)
    vbt_ref[:] = vbt.astype(jnp.bfloat16) if fast else vbt


def stream_prep_degrid_pallas(u_off, u_frac, v_frac, w_row, valid_f,
                              iv0, uv_coeffs, w_coeffs,
                              oversampling: int, w_oversampling: int,
                              support: int, w_support: int, lanes: int,
                              block_v: int, fast: bool = False,
                              interpret: bool = False):
    """Degrid twin of :func:`stream_prep_grid_pallas`: placed plan ->
    (ubase [16, cap], vband_t [lanes, cap], wk_t [Sw, cap]); the
    w-taps are zeroed on invalid slots via ``valid_f`` (no
    visibilities to zero-mask on this direction)."""
    cap = u_off.shape[0]
    g = PREP_G
    if cap % g:
        raise ValueError(
            f"stream capacity {cap} not a multiple of {g}")
    num_g = cap // g
    c_uv = np.asarray(uv_coeffs, np.float32)
    c_w = np.asarray(w_coeffs, np.float32)
    vec = pl.BlockSpec((g,), lambda b: (b,),
                       memory_space=pltpu.VMEM)
    cspec_uv = pl.BlockSpec(c_uv.shape, lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    cspec_w = pl.BlockSpec(c_w.shape, lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _stream_prep_degrid_kernel,
            inv2_ov=np.float32(2.0 / oversampling),
            inv2_wov=np.float32(2.0 / w_oversampling),
            support=support, w_support=w_support, lanes=lanes,
            fast=fast),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(num_g,),
            in_specs=[cspec_uv, cspec_w] + [vec] * 6,
            out_specs=[
                pl.BlockSpec((WIN_ROWS, g), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lanes, g), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_support, g), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((WIN_ROWS, cap), jnp.float32),
            jax.ShapeDtypeStruct(
                (lanes, cap), jnp.bfloat16 if fast else jnp.float32),
            jax.ShapeDtypeStruct((w_support, cap), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(c_uv, c_w, u_off, u_frac, v_frac, w_row, valid_f, iv0)


def _fold_groups_kernel(visited_ref, wins_ref, out_ref, *,
                        num_octets: int):
    ts = pl.program_id(0)
    out_ref[:, 0] = jnp.zeros_like(out_ref[:, 0])
    for g in range(num_octets):
        keep = visited_ref[ts * num_octets + g] != 0

        @pl.when(keep)
        def _(g=g):
            if g + 1 < num_octets:
                out_ref[:, 0, 8 * g:8 * g + WIN_ROWS, :] += \
                    wins_ref[:, g]
            else:
                # The last octet's straddle half is provably zero
                # (iu0 <= size - support): clip so the output is
                # exactly the subgrid rows (no crop pass).
                out_ref[:, 0, 8 * g:8 * g + 8, :] += \
                    wins_ref[:, g, :8, :]


@functools.partial(jax.jit, static_argnames=(
    "num_groups", "num_octets", "interpret"))
def fold_groups_pallas(wins: Array, visited, num_groups: int,
                       num_octets: int,
                       interpret: bool = False) -> Array:
    """Sum each (task, slab) group's octet windows at their 8-row
    offsets: [num_p, groups*G, 16, L] -> [num_p, groups, 8G, L]
    (the last octet's straddle half is provably zero and clipped,
    so the output rows are exactly the subgrid rows).

    One DMA pass over the window stack; the XLA formulation of this
    fold materialises several GB-scale intermediates (~17 ms at 1024^2
    scale vs ~4 ms here). ``visited`` is the plan's int32 mask —
    unvisited windows hold garbage and are skipped entirely.
    """
    num_p, _, _, lanes = wins.shape
    rows_out = 8 * num_octets
    return pl.pallas_call(
        functools.partial(_fold_groups_kernel, num_octets=num_octets),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_groups,),
            in_specs=[
                pl.BlockSpec((num_p, num_octets, WIN_ROWS, lanes),
                             lambda ts, v: (0, ts, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (num_p, 1, rows_out, lanes),
                lambda ts, v: (0, ts, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_p, num_groups, rows_out, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(visited, wins)


def _fold_layers_kernel(part_ref, out_ref, *, w_support: int,
                        num_slabs: int):
    out_ref[:, 0] = jnp.zeros_like(out_ref[:, 0])
    for ri in range(2):
        for layer in range(w_support):
            for s in range(num_slabs):
                out_ref[ri, 0, s + layer] += \
                    part_ref[ri * w_support + layer, s]


@functools.partial(jax.jit, static_argnames=(
    "num_tasks", "num_slabs", "w_support", "num_layers", "interpret"))
def fold_layers_pallas(part: Array, num_tasks: int, num_slabs: int,
                       w_support: int, num_layers: int,
                       interpret: bool = False) -> Array:
    """Slab -> absolute-layer fold per task: [num_p, T*S, size, L] ->
    [2, T, Kmax, size, L] (layer k accumulates slabs s = k-l for each
    of the w_support window offsets l). One DMA pass; the XLA
    slice-add chain re-read the GB-scale stack per offset."""
    num_p, _, size, lanes = part.shape
    return pl.pallas_call(
        functools.partial(_fold_layers_kernel, w_support=w_support,
                          num_slabs=num_slabs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(num_tasks,),
            in_specs=[
                pl.BlockSpec((num_p, num_slabs, size, lanes),
                             lambda t: (0, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, 1, num_layers, size, lanes),
                lambda t: (0, t, 0, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (2, num_tasks, num_layers, size, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(part)


def _window_from_stack(ts_ref, k0, g8, w_support: int, sub_pad: int):
    """Assemble a block's [2*w_support*16, lanes] window from the
    task's resident tower stack (mirror of :func:`_stack_accumulate`:
    8 dynamic [16, lanes] slices at 8-aligned sublane offsets, rows
    ordered re-layers then im-layers as :func:`_degrid_math` expects).
    """
    parts = []
    for ri in range(2):
        for layer in range(w_support):
            off = (k0 + layer) * sub_pad + g8
            parts.append(ts_ref[0, ri, pl.ds(off, WIN_ROWS), :])
    return jnp.concatenate(parts, axis=0)


def _degrid_stack_kernel(t_ref, k_ref, g_ref, ubase_ref, vbt_ref,
                         wkt_ref, ts_ref, out_ref, *, w_support: int,
                         sub_pad: int, precision):
    b = pl.program_id(0)
    win = _window_from_stack(ts_ref, k_ref[b], g_ref[b] * 8,
                             w_support, sub_pad)
    _degrid_math(win, ubase_ref[:], vbt_ref[:], wkt_ref[:], out_ref,
                 w_support, precision)


def _degrid_stack_kernel_high(t_ref, k_ref, g_ref, ubase_ref,
                              vbth_ref, vbtl_ref, wkt_ref, ts_ref,
                              out_ref, *, w_support: int,
                              sub_pad: int):
    b = pl.program_id(0)
    win = _window_from_stack(ts_ref, k_ref[b], g_ref[b] * 8,
                             w_support, sub_pad)
    _degrid_math_high(win, ubase_ref[:], vbth_ref[:], vbtl_ref[:],
                      wkt_ref[:], out_ref, w_support)


@functools.partial(jax.jit, static_argnames=(
    "w_support", "block_v", "fast", "interpret", "raw"))
def degrid_stack_pallas(stack: Array, t_idx, k_idx, g_idx, ubase,
                        vband_t, wk_t, w_support: int,
                        block_v: int = 128, fast: bool = False,
                        interpret: bool = False,
                        raw: bool = False) -> Array:
    """Band-stream degridding from per-TASK tower stacks (v3).

    ``stack``: [T, 2, num_layers*(lanes+8), lanes] f32 — the same
    task-major layout :func:`grid_packed_stack_pallas` produces (the
    driver builds it with one reshape from the FFT'd layer stack).
    Each task's full stack rides ONE input-block DMA and stays
    resident across all its blocks; windows are sliced in VMEM —
    the per-bucket (8, 128)-tile fetches of
    :func:`degrid_fused_pallas` cost 64 KB per OCCUPIED BUCKET
    (~250 MB per 1M-vis whole-image call), this form costs
    ``T * stack_bytes`` (~56 MB).  Returns [V] complex64 in sorted
    order (``raw=True``: the [8, V] f32 pair).
    """
    high = isinstance(vband_t, (tuple, list))
    vbt0 = vband_t[0] if high else vband_t
    total = vbt0.shape[1]
    num_blocks = total // block_v
    lanes_win = vbt0.shape[0]
    ksp = stack.shape[2]
    sub_pad = lanes_win + 8
    vbt_spec = pl.BlockSpec((lanes_win, block_v),
                            lambda b, t, k, g: (0, b),
                            memory_space=pltpu.VMEM)
    if high:
        kern = functools.partial(_degrid_stack_kernel_high,
                                 w_support=w_support, sub_pad=sub_pad)
        vbt_specs = [vbt_spec, vbt_spec]
        vbt_ops = tuple(vband_t)
    else:
        kern = functools.partial(_degrid_stack_kernel,
                                 w_support=w_support, sub_pad=sub_pad,
                                 precision=_precision(fast))
        vbt_specs = [vbt_spec]
        vbt_ops = (vband_t,)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((WIN_ROWS, block_v),
                             lambda b, t, k, g: (0, b),
                             memory_space=pltpu.VMEM),
            ] + vbt_specs + [
                pl.BlockSpec((w_support, block_v),
                             lambda b, t, k, g: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, ksp, lanes_win),
                             lambda b, t, k, g: (t[b], 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block_v),
                                   lambda b, t, k, g: (0, b),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(t_idx, k_idx, g_idx, ubase, *vbt_ops, wk_t, stack)
    if raw:
        return out
    return jax.lax.complex(out[0], out[1])


def _degrid_fused_kernel(p_ref, g_ref, hv_ref, ubase_ref, vbt_ref,
                         wkt_ref, *rest, w_support: int, n_vq: int,
                         precision):
    quads = rest[:-1]
    out_ref = rest[-1]
    # Window assembly from the 2*n_vq aligned (8-row, 128-lane)
    # quadrant tiles per layer, straight out of the padded plane stack
    # (the BlockSpec index maps place them; consecutive blocks of the
    # same bucket re-use the resident tiles — no dense window array,
    # no unfold pass, no per-block window re-DMA).
    row16 = []
    for layer in range(w_support):
        q = [quads[2 * n_vq * layer + i] for i in range(2 * n_vq)]
        row16.append((
            jnp.concatenate([q[i][:, 0] for i in range(n_vq)], axis=2),
            jnp.concatenate([q[n_vq + i][:, 0] for i in range(n_vq)],
                            axis=2)))
    win = jnp.concatenate(
        [jnp.concatenate([top[ri], bot[ri]], axis=0)
         for ri in range(2) for (top, bot) in row16], axis=0)
    _degrid_math(win, ubase_ref[:], vbt_ref[:], wkt_ref[:], out_ref,
                 w_support, precision)


@functools.partial(jax.jit, static_argnames=(
    "w_support", "block_v", "fast", "interpret", "raw"))
def degrid_fused_pallas(planes: Array, p_idx, g_idx, hv_idx, ubase,
                        vband_t, wk_t, w_support: int,
                        block_v: int = 128, fast: bool = False,
                        interpret: bool = False,
                        raw: bool = False) -> Array:
    """Fused degridding: padded plane stack -> sorted visibilities.

    planes: [2, P, rows_pad, lanes_pad] f32 (re/im planes of the FFT'd
    grid stack; P = num_w_grids for ES-FFT, T*Kmax for w-towers;
    rows_pad % 8 == 0, lanes_pad % 128 == 0). p_idx/g_idx/hv_idx: [NB]
    int32 per-block coordinates: first plane of the block's w window,
    u-octet block (8-row), v-128-lane block (0 when the window spans
    the full lane width, as in w-towers). Each grid step streams its
    bucket's window as 2*n_vq*w_support aligned (8, 128) tiles of
    ``planes`` selected by scalar-prefetched index maps — the dense
    window array (O(GB) at production grid sizes) and its unfold pass
    disappear entirely, and Pallas skips the tile DMAs for consecutive
    blocks of the same bucket. ubase: [16, V]; vband_t: [lanes_win, V]
    (lanes_win = n_vq*128); wk_t: [w_support, V] (zeroed for padded /
    invalid entries). Returns [V] complex64 in sorted order.
    """
    total = vband_t.shape[1]
    num_blocks = total // block_v
    lanes_win = vband_t.shape[0]
    n_vq = lanes_win // 128

    quad_specs = []
    for layer in range(w_support):
        for dg in (0, 1):
            for dv in range(n_vq):
                quad_specs.append(pl.BlockSpec(
                    (2, 1, 8, 128),
                    functools.partial(
                        lambda b, p, g, hv, L=0, DG=0, DV=0:
                        (0, p[b] + L, g[b] + DG, hv[b] + DV),
                        L=layer, DG=dg, DV=dv),
                    memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_degrid_fused_kernel, w_support=w_support,
                          n_vq=n_vq, precision=_precision(fast)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((WIN_ROWS, block_v),
                             lambda b, p, g, hv: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lanes_win, block_v),
                             lambda b, p, g, hv: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_support, block_v),
                             lambda b, p, g, hv: (0, b),
                             memory_space=pltpu.VMEM),
            ] + quad_specs,
            out_specs=pl.BlockSpec((8, block_v),
                                   lambda b, p, g, hv: (0, b),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(p_idx, g_idx, hv_idx, ubase, vband_t, wk_t,
      *([planes] * (2 * n_vq * w_support)))
    if raw:
        # [8, V] f32 (row 0 = re, row 1 = im, rest zero) for callers
        # that unsort via an 8-lane row-gather (parallel/streaming.py).
        return out
    return jax.lax.complex(out[0], out[1])
