"""Packed w-stacking drivers: the round-2 whole-image performance path.

Pipeline (single kernel invocation per grid/degrid call, all tasks):

1. **Plan** (host, once per uvw distribution): every (row, channel)
   visibility is assigned to its (w-plane, sub-grid) task box, its
   w-slab ``k0`` (first absolute tower layer touched) and u-octet
   ``g = iu0 // 8``; the stream is bucket-sorted by (task, slab,
   octet) and each bucket padded to a block multiple. All kernel tap
   values are table lookups on the host (f64) — the host is the single
   source of truth for the quantised geometry, so the device never
   re-derives (and can never disagree about) bucket membership.
2. **Bands** (device, once per plan): :func:`build_bands` places the
   taps at their sublane/lane offsets; the result is streamed by every
   subsequent call.
3. **Grid** (device, per call): scale stack -> one
   :func:`grid_packed_pallas` pass over all blocks -> pure-reshape
   fold of bucket windows into per-task layer stacks -> batched iFFT
   -> shared w-pattern ladder contraction (one complex einsum; the
   per-task prefactor ``w_pattern**e0`` is a host-precomputed
   constant) -> wrap-around subgrid adds -> per-plane grid correction.
   Degrid mirrors it (window cut-out instead of fold).

Compared to :mod:`.bucketed` (round 1), this removes the per-task
Python/dispatch loop around the kernels, drops the dense-band matmul
formulation (~10x FLOPs), and hoists all tap computation out of the
per-iteration path.

Reference equivalents: the OpenMP task queue + per-task gridder calls
(sdp_grid_wstack_wtower.cpp:388-440) and the GPU bucket-sort tiling
(sdp_tiled_functions.cu); the vis-count invariant mirrors
sdp_grid_wstack_wtower.cpp:442-448 (raises instead of exit(1)).
"""

import hashlib
import math
from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..fourier_transforms.fft import fft_shifted, ifft_shifted, \
    ifft_shifted_norm
from ..grid_data.grid_correct import grid_correct_pswf, \
    w_screen_stack
from ..grid_data.gridder_utils import (
    subgrid_add_static,
    subgrid_cut_out_static,
)
from ..kernels.fused_tap import (
    degrid_compact_pallas,
    degrid_fused2_stack_pallas,
    fused_geometry_ok,
    grid_compact_pallas,
    grid_fused_stack_pallas,
    pack_plan_words,
)
from ..kernels.packed_tap import (
    WIN_ROWS,
    build_bands,
    degrid_stack_pallas,
    fold_groups_pallas,
    fold_layers_pallas,
    grid_packed_stack_pallas,
)
from ..utility.constants import C_0
from ..utility.errors import SdpInvalidArgumentError, SdpRuntimeError
from .wstack import WStackPlan

Array = jax.Array


@dataclass(frozen=True)
class PackedTask:
    iu: int
    iv: int
    iw: int
    first_w_plane: int


@dataclass(frozen=True)
class PackedPlan:
    """Static packed-ingest geometry + host index/tap arrays.

    Equality/hash cover the geometry and a content digest of the index
    arrays, so value-equal plans share compiled drivers while plans
    with different permutations never collide (the round-1 advisor's
    cache-identity hazard).
    """

    wplan: WStackPlan
    tasks: Tuple[PackedTask, ...]
    num_rows: int
    num_layers: int          # Kmax: uniform padded tower depth
    num_slabs: int           # Kmax - w_support + 1
    num_octets: int
    block_v: int
    total: int               # padded sorted-stream length
    num_blocks: int
    num_buckets: int
    digest: str
    arrays: Dict[str, np.ndarray] = field(compare=False, hash=False,
                                          repr=False, default=None)

    @property
    def w_plane_ids(self):
        return tuple(sorted({t.iw for t in self.tasks}))


def _round_half_away_np(x):
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _plane_screens(kernel, w_offsets, inverse: bool):
    """Stacked w-stacking screens ``[P, G, G]`` (complex64, in-jit).

    ``exp(+i 2 pi w_step w_offset n)`` per plane when ``inverse`` (the
    grid correction multiplies by the screen,
    sdp_gridder_grid_correct.cpp:77-115); the degrid correction divides,
    i.e. multiplies by the conjugate (offset sign flip — unit modulus).
    Batching the screens lets all per-plane corrections ride ONE
    image-sized elementwise pass and the plane FFTs ONE batched
    transform instead of a per-plane loop. Screen construction is
    shared with :func:`..grid_data.grid_correct.w_screen_stack`.
    """
    offs = np.asarray(w_offsets, np.float64)
    if not inverse:
        offs = -offs
    return w_screen_stack(kernel.image_size, kernel.theta,
                          kernel.w_step, kernel.shear_u, kernel.shear_v,
                          offs, dtype=jnp.complex64)


def _planes_to_image(kernel, planes, w_offsets, screens=None):
    """Per-w-plane uv grids ``[P, G, G]`` -> corrected real image.

    One batched iFFT + one stacked-screen contraction + the shared
    PSWF correction (hoisted out of the plane sum — it is w-independent,
    sdp_gridder_grid_correct.cpp:19-74).  ``screens`` lets the caller
    pass the PRECOMPUTED stack as a jit argument — the screens are
    static per plan, and rebuilding them in-jit costs ~P*N^2 sin/cos
    per call (measured 3.04 ms of the 5.6 ms headline degrid).
    """
    stack = ifft_shifted_norm(planes)
    if screens is None:
        screens = _plane_screens(kernel, w_offsets, inverse=True)
    image = jnp.einsum("puv,puv->uv", screens, stack)
    image = grid_correct_pswf(
        kernel.image_size, kernel.theta, kernel.w_step, kernel.shear_u,
        kernel.shear_v, kernel.support, kernel.w_support, image)
    return image.real.astype(jnp.float32)


def _image_to_plane_stack(kernel, image, w_offsets, screens=None):
    """Real image -> per-w-plane degrid-corrected uv grids ``[P, G, G]``
    via one shared PSWF multiply, one stacked conjugate screen and ONE
    batched FFT (mirror of :func:`_planes_to_image`, same precomputed
    ``screens`` option)."""
    base = grid_correct_pswf(
        kernel.image_size, kernel.theta, kernel.w_step, kernel.shear_u,
        kernel.shear_v, kernel.support, kernel.w_support,
        image.astype(jnp.complex64))
    if screens is None:
        screens = _plane_screens(kernel, w_offsets, inverse=False)
    return fft_shifted(base[None] * screens)


# Per-block fixed kernel cost expressed in visibility-equivalents.
# Measured on-chip 2026-08-19 (experiments/exp_block.py, dense 4.2M-vis
# stream, full 128..2048 sweep in both precisions): ~180-670 ns fixed
# per block against a BLOCK-INDEPENDENT floor of ~10-12 ms f32 /
# ~6-9 ms bf16 (operand streaming + dots, proportional to padded
# slots) — so larger blocks win until bucket-padding blows up the
# slot count.  f32 grid 214/281/311/349/336 Mvis/s at
# 128/256/512/1024/2048 (1024 validated best standalone — the round-2
# OOM at 1024 was cumulative across four coexisting plans in one
# process); bf16 468 at 1024 vs 475 at 2048 (within noise of the
# 1.33x-pad cost; not worth a precision-dependent candidate list).
# Auto-selection minimises
# padded_total + _BLOCK_OVERHEAD_VIS * num_blocks.
_BLOCK_OVERHEAD_VIS = 150
_BLOCK_CANDIDATES = (128, 256, 512, 1024)


def _auto_block_v(counts: np.ndarray) -> int:
    best, best_cost = _BLOCK_CANDIDATES[0], None
    for bv in _BLOCK_CANDIDATES:
        padded = int((-(-counts // bv) * bv).sum())
        cost = padded + _BLOCK_OVERHEAD_VIS * (padded // bv)
        if best_cost is None or cost < best_cost:
            best, best_cost = bv, cost
    return best


def packed_geometry_ok(subgrid_size: int, support: int, w_support: int,
                       subgrid_frac: float) -> bool:
    """True when the packed formulation can express the geometry.

    The single source of the packed-path constraints (used by
    plan_packed and the reference-driver ``engine="auto"`` routing):
    octet window (support <= 8), MXU row packing
    (2*w_support*WIN_ROWS <= 128), lane-aligned subgrids
    (subgrid_size % 128 == 0), and the in-window tap invariant
    (eff_sg_size + support <= subgrid_size).
    """
    eff = int(math.floor(subgrid_size * (subgrid_frac or 2.0 / 3.0)))
    return (support <= 8 and 2 * w_support * WIN_ROWS <= 128
            and subgrid_size % 128 == 0
            and eff + support <= subgrid_size)


def plan_packed(wplan: WStackPlan, uvw, block_v=None,
                pad_blocks_to: int = 1) -> PackedPlan:
    """Build the packed ingest plan on the host (NumPy, f64).

    Enumerates the task boxes directly from the per-(row, channel)
    assignment (so no visibility can ever be dropped — the plan and
    the assignment are the same arithmetic), bucket-sorts by
    (task, w-slab, u-octet) and precomputes all kernel taps by table
    lookup. ``block_v=None`` picks the kernel block size from the
    bucket-occupancy histogram (128 for sparse streams, 256 when the
    padding it costs is cheaper than the per-block overhead — dense
    4M-vis streams measure 200 -> 256 Mvis/s).
    """
    support, w_support = wplan.support, wplan.w_support
    sgs = wplan.subgrid_size
    if not packed_geometry_ok(sgs, support, w_support,
                              wplan.subgrid_frac):
        raise SdpInvalidArgumentError(
            "packed path requires support <= 8 (octet window), "
            "w_support <= 4 (MXU row packing), subgrid_size % 128 == 0 "
            "and eff_sg_size + support <= subgrid_size (got "
            f"support={support}, w_support={w_support}, "
            f"subgrid_size={sgs}, eff_sg_size={wplan.eff_sg_size})")

    from ..utility.device import to_host

    uvw = to_host(uvw, np.float64)
    num_rows = uvw.shape[0]
    num_chan = wplan.num_chan
    freq0 = wplan.freq0_hz
    dfreq = wplan.dfreq_hz or 10.0
    theta, w_step = wplan.theta, wplan.w_step
    ov, w_ov = wplan.oversampling, wplan.w_oversampling
    d = wplan.eff_sg_dist
    wd = wplan.w_stack_dist
    height = wplan.w_tower_height

    num_vis = num_rows * num_chan
    if num_vis == 0:
        raise SdpInvalidArgumentError(
            "packed plan needs at least one (row, channel) visibility "
            f"(got {num_rows} rows x {num_chan} channels)")

    # Task enumeration + per-task w bounds: native one-pass scan when
    # available (host_runtime.cpp sdp_tpu_packed_tasks), else NumPy on
    # a packed scalar key (lexicographic in (biw, biu, biv); ~10x
    # faster than np.unique(axis=0)'s void view).
    from .. import native as native_runtime

    u = v = w = None
    nat_tasks = native_runtime.packed_tasks(
        uvw, freq0, dfreq, num_chan, d, wd)
    if nat_tasks is not None:
        task_id, boxes, wmin_t, wmax_t = nat_tasks
        num_tasks = boxes.shape[0]
    else:
        scale = (freq0 + dfreq * np.arange(num_chan)) / C_0
        u = (uvw[:, 0:1] * scale[None, :]).ravel()
        v = (uvw[:, 1:2] * scale[None, :]).ravel()
        w = (uvw[:, 2:3] * scale[None, :]).ravel()

        biu = np.floor(u / d + 0.5).astype(np.int64)
        biv = np.floor(v / d + 0.5).astype(np.int64)
        biw = np.floor(w / wd + 0.5).astype(np.int64)

        span = 1 << 20
        box_key = ((biw + span // 2) * span + (biu + span // 2)) * span \
            + (biv + span // 2)
        keys, task_id = np.unique(box_key, return_inverse=True)
        task_id = task_id.ravel()
        num_tasks = keys.shape[0]
        boxes = np.stack([keys // (span * span) - span // 2,
                          (keys // span) % span - span // 2,
                          keys % span - span // 2], axis=1)

        # Segment reductions over the task-sorted stream (no per-task
        # Python loop).
        order_t = np.argsort(task_id, kind="stable")
        seg = np.searchsorted(task_id[order_t], np.arange(num_tasks))
        w_sorted = w[order_t]
        wmin_t = np.minimum.reduceat(w_sorted, seg)
        wmax_t = np.maximum.reduceat(w_sorted, seg)

    # Per-task w bounds -> tower plane range (plan_wstack geometry,
    # sdp_grid_wstack_wtower.cpp:310-330).
    eta = 1e-5
    off_w_t = np.trunc(boxes[:, 0] * height).astype(np.int64)
    first_t = (np.floor(wmin_t / w_step - eta).astype(np.int64)
               - off_w_t)
    last_t = (np.ceil(wmax_t / w_step + eta).astype(np.int64)
              - off_w_t + 1)
    num_planes_t = 1 + last_t - first_t
    num_layers = int((num_planes_t + w_support - 1).max())
    num_slabs = num_layers - w_support + 1
    num_octets = sgs // 8

    kernel = wplan.kernel()
    num_buckets = num_tasks * num_slabs * num_octets

    # Native C++/OpenMP two-pass planner (geometry + bucket counting +
    # stable placement + tap table fills); NumPy fallback below.
    nat = native_runtime.packed_plan_arrays(
        uvw, freq0, dfreq, num_chan, d, theta, w_step, height, ov,
        w_ov, sgs, support, w_support, task_id, first_t, off_w_t,
        num_planes_t, num_slabs, num_octets, block_v,
        kernel.uv_kernel, kernel.w_kernel)
    if nat is not None:
        sort_index, valid = nat["sort_index"], nat["valid"]
        u_off_s, iv0_s = nat["u_off"], nat["iv0"]
        uk_s, vk_s, wk_s = nat["uk"], nat["vk"], nat["wk"]
        u_frac_s, v_frac_s = nat["u_frac"], nat["v_frac"]
        w_row_s = nat["w_row"]
        counts, padded, total = nat["counts"], nat["padded"], \
            nat["total"]
        block_v = nat["block_v"]
        num_blocks = total // block_v
    else:
        # Per-entry tap geometry relative to its own task (host =
        # single source of truth; formulas mirror
        # sdp_gridder_wtower_uvw.cpp:126-142 via grid_data/wtower.py).
        if u is None:
            scale = (freq0 + dfreq * np.arange(num_chan)) / C_0
            u = (uvw[:, 0:1] * scale[None, :]).ravel()
            v = (uvw[:, 1:2] * scale[None, :]).ravel()
            w = (uvw[:, 2:3] * scale[None, :]).ravel()
            biu = np.floor(u / d + 0.5).astype(np.int64)
            biv = np.floor(v / d + 0.5).astype(np.int64)
        half_ov = (sgs // 2 - support // 2 + 1) * ov
        u_rel = u - biu * d
        v_rel = v - biv * d
        iu0_ov = _round_half_away_np(
            u_rel * (theta * ov)).astype(np.int64) + half_ov
        iv0_ov = _round_half_away_np(
            v_rel * (theta * ov)).astype(np.int64) + half_ov
        iu0 = np.clip(iu0_ov // ov, 0, sgs - support)
        iv0 = np.clip(iv0_ov // ov, 0, sgs - support)
        u_frac = np.mod(iu0_ov, ov)
        v_frac = np.mod(iv0_ov, ov)

        w_rel = w - off_w_t[task_id] * w_step
        j = np.floor(w_rel / w_step).astype(np.int64) + 1 \
            - first_t[task_id]
        w_rel2 = w_rel - (first_t[task_id] + j - 1) * w_step
        w_row = np.mod(
            _round_half_away_np(
                w_rel2 * (w_ov / w_step)).astype(np.int64), w_ov)

        bad = (j < 0) | (j >= num_planes_t[task_id])
        if bad.any():
            # The invariant of sdp_grid_wstack_wtower.cpp:442-448:
            # every visibility must land in a planned slab.
            raise SdpRuntimeError(
                f"packed plan: {int(bad.sum())} of {num_vis} "
                "visibilities fall outside their task's w-tower range")

        uk = kernel.uv_kernel[u_frac].astype(np.float32)     # [V, S]
        vk = kernel.uv_kernel[v_frac].astype(np.float32)
        wk = kernel.w_kernel[w_row].astype(np.float32)       # [V, Sw]

        octet = (iu0 >> 3).astype(np.int64)
        u_off = (iu0 & 7).astype(np.int32)
        bucket = (task_id * num_slabs + j) * num_octets + octet

        counts = np.bincount(bucket, minlength=num_buckets)
        if block_v is None:
            block_v = _auto_block_v(counts)
        padded = -(-counts // block_v) * block_v            # 0 stays 0
        pad_off = np.zeros(num_buckets + 1, np.int64)
        np.cumsum(padded, out=pad_off[1:])
        total = int(pad_off[-1])

        order = np.argsort(bucket, kind="stable")
        sstart = np.zeros(num_buckets, np.int64)
        np.cumsum(counts[:-1], out=sstart[1:])
        rank = np.arange(num_vis) - sstart[bucket[order]]
        dest = pad_off[bucket[order]] + rank

        sort_index = np.zeros(total, np.int64)
        valid = np.zeros(total, bool)
        sort_index[dest] = order
        valid[dest] = True

        def scatter(x, fill=0):
            out = np.full((total,) + x.shape[1:], fill, x.dtype)
            out[dest] = x[order]
            return out

        u_off_s = scatter(u_off)
        iv0_s = scatter(iv0.astype(np.int32))
        uk_s = scatter(uk)
        vk_s = scatter(vk)
        wk_s = scatter(wk)
        u_frac_s = scatter(u_frac.astype(np.int32))
        v_frac_s = scatter(v_frac.astype(np.int32))
        w_row_s = scatter(w_row.astype(np.int32))
    num_blocks = total // block_v

    nonzero = np.nonzero(padded)[0]
    block_bucket = np.repeat(nonzero,
                             (padded[nonzero] // block_v)).astype(np.int32)
    visited = counts > 0

    # Optional trailing pad blocks (mesh sharding needs num_blocks to be
    # a device multiple): they re-visit the last bucket with all-zero
    # taps, so each shard's runs stay contiguous and the sums unchanged.
    extra = (-num_blocks) % pad_blocks_to
    if extra:
        block_bucket = np.concatenate(
            [block_bucket, np.full(extra, block_bucket[-1], np.int32)])
        pad_n = extra * block_v
        sort_index = np.concatenate([sort_index, np.zeros(pad_n, np.int64)])
        valid = np.concatenate([valid, np.zeros(pad_n, bool)])
        u_off_s = np.concatenate([u_off_s, np.zeros(pad_n, np.int32)])
        iv0_s = np.concatenate([iv0_s, np.zeros(pad_n, np.int32)])
        uk_s = np.concatenate([uk_s, np.zeros((pad_n, support), np.float32)])
        vk_s = np.concatenate([vk_s, np.zeros((pad_n, support), np.float32)])
        wk_s = np.concatenate([wk_s, np.zeros((pad_n, w_support),
                                              np.float32)])
        u_frac_s = np.concatenate([u_frac_s, np.zeros(pad_n, np.int32)])
        v_frac_s = np.concatenate([v_frac_s, np.zeros(pad_n, np.int32)])
        w_row_s = np.concatenate([w_row_s, np.zeros(pad_n, np.int32)])
        total += pad_n
        num_blocks += extra

    tasks = tuple(
        PackedTask(int(boxes[t, 1]), int(boxes[t, 2]), int(boxes[t, 0]),
                   int(first_t[t]))
        for t in range(num_tasks))

    arrays = dict(sort_index=sort_index, valid=valid, u_off=u_off_s,
                  iv0=iv0_s, uk=uk_s, vk=vk_s, wk=wk_s,
                  u_frac=u_frac_s, v_frac=v_frac_s, w_row=w_row_s,
                  block_bucket=block_bucket, visited=visited)
    # Every array the gridder consumes must be covered: u_frac/v_frac/
    # w_row feed the device tap evaluation — two plans differing only
    # in sub-cell fractions must NOT alias in the gridder cache.
    digest_names = ("sort_index", "valid", "u_off", "iv0",
                    "u_frac", "v_frac", "w_row",
                    "block_bucket", "visited")
    task_bytes = "".join(repr(t) for t in tasks).encode()
    digest = native_runtime.hash_arrays(
        [arrays[n] for n in digest_names]
        + [np.frombuffer(task_bytes, np.uint8)])
    if digest is None:
        h = hashlib.sha256()
        for name in digest_names:
            h.update(np.ascontiguousarray(arrays[name]).tobytes())
        h.update(task_bytes)
        digest = h.hexdigest()

    return PackedPlan(
        wplan=wplan, tasks=tasks, num_rows=num_rows,
        num_layers=num_layers,
        num_slabs=num_slabs, num_octets=num_octets, block_v=block_v,
        total=total, num_blocks=num_blocks, num_buckets=num_buckets,
        digest=digest, arrays=arrays)


# ---------------------------------------------------------------------------
# Window fold / unfold (pure reshapes; see packed_tap.py row layout)
# ---------------------------------------------------------------------------


def _fold_windows(wins, visited, num_tasks, num_slabs, num_octets,
                  w_support, num_layers, interpret):
    """[2*Sw, TB, 16, size] windows -> [T, Kmax, size, size] complex.

    The octet-offset summation runs in :func:`fold_groups_pallas` (one
    DMA pass over the window stack — the XLA formulation materialised
    several GB-scale intermediates, ~17 ms at 1024^2 scale); the layer
    fold is a handful of aligned slice-adds.
    """
    groups = num_tasks * num_slabs
    part = fold_groups_pallas(wins, visited.astype(jnp.int32),
                              groups, num_octets, interpret)
    out = fold_layers_pallas(part, num_tasks, num_slabs, w_support,
                             num_layers, interpret)
    return jax.lax.complex(out[0], out[1])


# ---------------------------------------------------------------------------
# Device driver
# ---------------------------------------------------------------------------

# Bounded LRU: each gridder pins large device arrays (vband alone is
# total * subgrid_size * 4 B), so an unbounded cache leaks HBM across
# re-plans (new pointing / time chunk). Solvers hold their own strong
# reference, so eviction only drops standby compilations.
_GRIDDER_CACHE: "dict" = {}
_GRIDDER_CACHE_MAX = 4

# Default MXU precision. "high" = bf16 hi/lo split, three SINGLE-PASS
# bf16 dots with f32 accumulate (the bands pre-split at plan attach;
# in-kernel operands split in VMEM). Round-5 decision (VERDICT r4 #3):
# measured 313.9/273.2 head and 631.8/512.2 dense grid/degrid vs
# 280.5/260.7 and 520.1/449.0 at "highest" (+12-21%), at 1.74e-6
# taper-weighted image error — two orders INSIDE the f32 path's own
# 2.5e-4-of-peak oracle envelope, so there is no accuracy reason to
# pay the native-f32 multi-pass (de-biased MXU peaks: bf16 ~161 TF/s
# vs f32 HIGHEST 29.6). "highest" remains available per call.
_DEFAULT_PRECISION = "high"

# Default engine (2026-08-20 round-5 on-chip A/B, v3 stack kernels,
# experiments/exp_stack.py — whole-image rates incl. all stages):
#
#   grid:   bands 453.1 dense / 202.6 headline vs fused 374.2 /
#           175.7 Mvis/s.  With the per-bucket window array and the
#           fold pass deleted (v3 per-task stack accumulation), the
#           band kernel's 600 B/slot stream rides fully overlapped
#           DMA while the fused kernel's in-kernel tap build still
#           serializes with the MXU (exp_overlap.py) — bands win
#           both scenarios at HIGHEST precision;
#   degrid: band kernel won already at r4 (390.3 vs fused 311.2).
#
# "auto" therefore routes BOTH directions through the band kernels
# on plan-once drivers; the fused kernels remain the STREAMING
# engine (they delete the prep stage and the per-chunk band
# materialisation, which plan-once paths pay only once).
_DEFAULT_ENGINE = "auto"


def packed_gridder(pplan: PackedPlan, fast: bool = False,
                   precision: str = None, engine: str = None):
    """Per-plan device driver (LRU-cached by the plan's content digest)."""
    # Resolve defaults BEFORE keying: packed_gridder(p) and
    # packed_gridder(p, precision="high") must share one cache entry
    # (each gridder pins GB-scale band arrays).
    if engine is None:
        engine = _DEFAULT_ENGINE
    if precision is None:
        precision = "bf16" if fast else _DEFAULT_PRECISION
    key = (pplan, fast, precision, engine)
    g = _GRIDDER_CACHE.pop(key, None)
    if g is None:
        g = PackedGridder(pplan, fast=fast, precision=precision,
                          engine=engine)
    _GRIDDER_CACHE[key] = g          # re-insert: most-recently-used
    while len(_GRIDDER_CACHE) > _GRIDDER_CACHE_MAX:
        _GRIDDER_CACHE.pop(next(iter(_GRIDDER_CACHE)))
    return g


class PackedGridder:
    """Holds the per-plan device arrays and jitted whole-image drivers.

    ``grid``/``degrid`` take/return visibilities in the natural
    ``[rows, chan]`` layout; ``grid_sorted``/``degrid_sorted`` work on
    the plan's sorted stream (the major-cycle solver keeps residual
    visibilities in sorted form so the per-iteration permutation
    gathers vanish).
    """

    def __init__(self, pplan: PackedPlan, fast: bool = False,
                 precision: str = None, engine: str = None):
        # engine=None -> _DEFAULT_ENGINE ("auto": fused-row grid +
        # band degrid, the measured per-direction winners); "fused" /
        # "bands" force one formulation for both directions.
        from ..utility.device import device_put

        self.pplan = pplan
        self.fast = bool(fast)
        if engine is None:
            engine = _DEFAULT_ENGINE
        if precision is None:
            precision = "bf16" if fast else _DEFAULT_PRECISION
        self.precision = precision
        self.interpret = jax.default_backend() != "tpu"
        plan = pplan.wplan
        kernel = plan.kernel()
        self._kernel = kernel
        arrays = pplan.arrays
        if arrays is None:
            raise SdpInvalidArgumentError("plan has no host arrays")
        if pplan.total >= 2 ** 31 or arrays["sort_index"].max(
                initial=0) >= 2 ** 31:
            raise SdpInvalidArgumentError(
                "packed stream too large for int32 indexing")

        self.sort_index = jnp.asarray(arrays["sort_index"].astype(np.int32))
        self.valid = jnp.asarray(arrays["valid"])
        from .bucketed import inverse_index_of

        self.inv_index = jnp.asarray(inverse_index_of(
            arrays["sort_index"], arrays["valid"],
            pplan.num_rows * plan.num_chan).astype(np.int32))
        self.block_bucket = jnp.asarray(arrays["block_bucket"])
        # Per-block (plane, u-octet, v-quad) coordinates for the fused
        # degrid kernel's window-tile index maps (plane = task*Kmax +
        # w-slab into the flattened layer stack; hv always 0 — the
        # window spans the subgrid's full lane width).
        # Per-block (task, w-slab, u-octet) for the v3 stack kernels.
        bb = arrays["block_bucket"].astype(np.int64)
        octet = bb % pplan.num_octets
        slab = (bb // pplan.num_octets) % pplan.num_slabs
        task = bb // (pplan.num_octets * pplan.num_slabs)
        self.g_idx = jnp.asarray(octet.astype(np.int32))
        self.t_idx = jnp.asarray(task.astype(np.int32))
        self.k_idx = jnp.asarray(slab.astype(np.int32))
        self.visited = jnp.asarray(arrays["visited"])

        # Compact plan upload: ship the integer oversampled kernel rows
        # and evaluate the tap values ON DEVICE via the Chebyshev fits
        # (fit error ~1e-13 vs the f64 tables, below f32 rounding) —
        # uploading the f32 uk/vk/wk arrays (80 B/slot) dominates
        # plan-attach latency on ~30 MB/s tunnelled links and scales
        # badly to 1e9-entry streams. Reference flags the same
        # tap-fetch cost on its CPU path
        # (sdp_gridder_wtower_uvw.cpp:446-450).
        from ..grid_data.wtower import _tap_coeffs_cached

        uv_c = _tap_coeffs_cached(plan.support, plan.oversampling)
        w_c = _tap_coeffs_cached(plan.w_support, plan.w_oversampling)
        self._uv_c, self._w_c = uv_c, w_c

        # Per-direction engine selection (see _DEFAULT_ENGINE): the
        # fused kernels evaluate taps in VMEM from two bit-packed
        # int32 words per slot (16 B/slot streams); the band kernels
        # stream pre-built tap bands (~600 B/slot, fully overlapped).
        # "auto" = bands both directions (round-5 A/B winner).
        packable = fused_geometry_ok(
            plan.subgrid_size, plan.support, plan.oversampling,
            plan.w_oversampling)
        self._fused_grid = engine == "fused" and packable
        self._fused_degrid = engine == "fused" and packable
        # "compact": pre-evaluated taps streamed (84 B/slot resident
        # vs the band arrays' ~600), placement in-kernel — measured
        # speed-equal to bands (grid identical; degrid +6% head / -3%
        # dense, experiments/exp_compact_degrid.py) at ~6x less plan
        # HBM. Opt-in: the mesh-sharded drivers still consume the
        # band operand format.
        self._compact = engine == "compact" and packable
        if self._compact and self.precision == "high":
            # The compact engine has no pre-split streams; its
            # in-kernel split would pay without the 3-dot win. Only
            # coerce when compact actually engages — a non-packable
            # plan falls back to the band engine, which runs 'high'.
            self.precision = "highest"
        # Back-compat alias (introspected by tests/experiments): true
        # only when BOTH directions run the fused kernels.
        self._fused = self._fused_grid and self._fused_degrid

        if self._fused_grid or self._compact:
            pa, pb = pack_plan_words(
                arrays["iv0"].astype(np.int32),
                arrays["u_off"].astype(np.int32),
                arrays["w_row"].astype(np.int32),
                arrays["u_frac"].astype(np.int32),
                arrays["v_frac"].astype(np.int32), arrays["valid"])
            self.pa = jnp.asarray(pa)
            self.pb = jnp.asarray(pb) if self._fused_grid else None
        else:
            self.pa = self.pb = None
        self.wk_t = self.ubase = self.vband = self.vband_t = None
        self.uk_t = self.vk_t = None
        if self._compact:
            from ..grid_data.kernels import eval_kernel_taps

            def _device_taps(u_frac, v_frac, w_row, valid):
                uk = eval_kernel_taps(u_frac, uv_c, plan.oversampling)
                vk = eval_kernel_taps(v_frac, uv_c, plan.oversampling)
                wk = jnp.where(
                    valid[:, None],
                    eval_kernel_taps(w_row, w_c, plan.w_oversampling),
                    0.0)
                return uk.T, vk.T, wk.T

            (self.uk_t, self.vk_t, self.wk_t) = jax.jit(_device_taps)(
                jnp.asarray(arrays["u_frac"]),
                jnp.asarray(arrays["v_frac"]),
                jnp.asarray(arrays["w_row"]), self.valid)
        elif not (self._fused_grid and self._fused_degrid):
            from ..grid_data.kernels import eval_kernel_taps

            need_vband = not self._fused_grid
            need_vband_t = not self._fused_degrid

            from ..kernels.packed_tap import split_bf16 as _split16

            def _device_bands(u_frac, v_frac, w_row, u_off, iv0, valid):
                uk = eval_kernel_taps(u_frac, uv_c, plan.oversampling)
                vk = eval_kernel_taps(v_frac, uv_c, plan.oversampling)
                wk = jnp.where(
                    valid[:, None],
                    eval_kernel_taps(w_row, w_c, plan.w_oversampling),
                    0.0)
                ubase, vband, vband_t = build_bands(
                    u_off, iv0, uk, vk, plan.subgrid_size)
                if self.precision == "high":
                    # "high": bands pre-split into bf16 hi/lo halves
                    # (same bytes as f32); the stack kernels run three
                    # single-pass bf16 dots — de-biased MXU peaks put
                    # this at ~1.8x native-f32 HIGHEST at ~1.4e-6
                    # taper-weighted accuracy.
                    vband = _split16(vband)
                    vband_t = _split16(vband_t)
                elif self.fast:
                    # Opt-in fast mode: bf16 v-band streams (half the
                    # dominant per-block HBM stream; the kernels
                    # switch to single-pass bf16 MXU dots — ~2e-3
                    # kernel accuracy).
                    vband = vband.astype(jnp.bfloat16)
                    vband_t = vband_t.astype(jnp.bfloat16)
                # wk ships transposed [Sw, V]: both kernels consume
                # the w-taps with the visibility on lanes, and the
                # grid scale build avoids a per-call V-major relayout.
                # Only the needed direction's band stays resident
                # (vband alone is total * subgrid_size * 4 B).
                return (wk.T, ubase,
                        vband if need_vband else jnp.zeros((), jnp.float32),
                        vband_t if need_vband_t else jnp.zeros((), jnp.float32))

            (self.wk_t, self.ubase, vband, vband_t) = \
                jax.jit(_device_bands)(
                    jnp.asarray(arrays["u_frac"]),
                    jnp.asarray(arrays["v_frac"]),
                    jnp.asarray(arrays["w_row"]),
                    jnp.asarray(arrays["u_off"]),
                    jnp.asarray(arrays["iv0"]), self.valid)
            self.vband = vband if need_vband else None
            self.vband_t = vband_t if need_vband_t else None
        if self._compact:
            self._grid_ops = (self.pa, self.uk_t, self.vk_t,
                              self.wk_t)
            self._degrid_ops = self._grid_ops
        else:
            self._grid_ops = ((self.pa, self.pb) if self._fused_grid
                              else (self.wk_t, self.ubase, self.vband))
            self._degrid_ops = ((self.pa, self.pb)
                                if self._fused_degrid
                                else (self.wk_t, self.ubase,
                                      self.vband_t))

        # Shared w-pattern ladders + per-task prefactors (host numpy
        # c128 -> device via re/im-plane transfer; jit constants must
        # not be complex device closures on tunnelled attachments).
        w_pattern = kernel.w_pattern            # [N, N] c128
        sw = plan.w_support
        karange = np.arange(pplan.num_layers)
        ladder_g = w_pattern[None] ** karange[:, None, None]
        ladder_d = w_pattern[None] ** (-karange[:, None, None])
        e0_g = np.asarray([t.first_w_plane + sw // 2 - sw
                           for t in pplan.tasks])
        e0_d = np.asarray([sw // 2 - t.first_w_plane
                           for t in pplan.tasks])
        pref_g = w_pattern[None] ** e0_g[:, None, None]
        pref_d = w_pattern[None] ** e0_d[:, None, None]
        self.ladder_grid = device_put(ladder_g.astype(np.complex64))
        self.ladder_degrid = device_put(ladder_d.astype(np.complex64))
        self.pref_grid = device_put(pref_g.astype(np.complex64))
        self.pref_degrid = device_put(pref_d.astype(np.complex64))
        # Host copies for the task-sharded mesh drivers (per-shard
        # zero-padded prefactor slices are built per mesh size).
        self._pref_g_host = pref_g.astype(np.complex64)
        self._pref_d_host = pref_d.astype(np.complex64)

        # Precomputed per-plane w-screen stacks (static per plan; jit
        # ARGUMENTS, not closures — rebuilding them in-jit cost ~P*N^2
        # sin/cos per call, measured 3.04 ms of the headline degrid,
        # and complex closure constants D2H-crash on tunnelled chips).
        w_offs = tuple(self._plane_offsets())
        self.screens_grid = jax.jit(
            lambda: _plane_screens(kernel, w_offs, True))()
        self.screens_degrid = jax.jit(
            lambda: _plane_screens(kernel, w_offs, False))()

        self._grid_jit = jax.jit(self._grid_impl)
        self._degrid_jit = jax.jit(self._degrid_impl)
        self._sort_jit = jax.jit(self._sort_impl)
        self._unsort_jit = jax.jit(self._unsort_impl)
        self._sharded_cache: dict = {}
        self._shard_meta_cache: dict = {}

    # -- sorted-stream transforms ------------------------------------

    def _sort_impl(self, vis, sort_index, valid):
        vis_s = vis.reshape(-1)[sort_index]
        vre = jnp.where(valid, vis_s.real, 0.0).astype(jnp.float32)
        vim = jnp.where(valid, vis_s.imag, 0.0).astype(jnp.float32)
        return vre, vim

    def sort(self, vis: Array):
        """[rows, chan] visibilities -> sorted-stream (re, im) pair."""
        return self._sort_jit(vis, self.sort_index, self.valid)

    def _unsort_impl(self, vis_sorted, inv_index):
        # Gather through the host-precomputed inverse permutation (an
        # XLA scatter at this size costs ~15 ms on the attached chip);
        # pad/dropped entries point at the guaranteed-zero final slot.
        out_padded = jnp.concatenate(
            [vis_sorted, jnp.zeros((1,), vis_sorted.dtype)])
        return out_padded[inv_index].reshape(
            self.pplan.num_rows, self.pplan.wplan.num_chan)

    def unsort(self, vis_sorted: Array):
        """Sorted-stream complex vis -> [rows, chan]."""
        return self._unsort_jit(vis_sorted, self.inv_index)

    # -- grid ----------------------------------------------------------

    # Grid pipeline stages (composable so report_timing can measure
    # marginal device time per stage; see _grid_impl for the flow).

    def _stage_kernel(self, vre, vim, ops, block_bucket):
        pplan = self.pplan
        plan = pplan.wplan
        if self._compact:
            pa, uk_t, vk_t, wk_t = ops
            t_idx, k_idx, g_idx = block_bucket
            return grid_compact_pallas(
                t_idx, k_idx, g_idx, pa, uk_t, vk_t, wk_t, vre, vim,
                len(pplan.tasks), pplan.num_layers, plan.subgrid_size,
                plan.support, plan.w_support, block_v=pplan.block_v,
                precision=self.precision, interpret=self.interpret)
        if self._fused_grid:
            pa, pb = ops
            t_idx, k_idx, g_idx = block_bucket
            return grid_fused_stack_pallas(
                t_idx, k_idx, g_idx, pa, pb, vre, vim, self._uv_c,
                self._w_c, len(pplan.tasks), pplan.num_layers,
                plan.subgrid_size, plan.support, plan.w_support,
                plan.oversampling, plan.w_oversampling,
                block_v=pplan.block_v, precision=self.precision,
                interpret=self.interpret)
        wk_t, ubase, vband = ops
        # Split-scales form: wk_t [Sw, V] + vre/vim stream straight
        # into the kernel and the scale stack is built in VMEM — the
        # pre-built ``scales`` cost an extra XLA pass (~56 B/slot of
        # HBM) plus 8 B/slot more stream every call, and the kernel
        # is bandwidth-bound.  v3 stack output (per-task tower stacks
        # in VMEM) for both engines: the per-bucket window array and
        # the fold pass are gone.
        t_idx, k_idx, g_idx = block_bucket
        return grid_packed_stack_pallas(
            t_idx, k_idx, g_idx, ubase, vband, (wk_t, vre, vim),
            len(pplan.tasks), pplan.num_layers, plan.subgrid_size,
            plan.w_support, block_v=pplan.block_v, fast=self.fast,
            interpret=self.interpret)

    def _stage_drain(self, layers, ladder, pref):
        layers = ifft_shifted(layers)
        subgrids = jnp.einsum("tkuv,kuv->tuv", layers, ladder) * pref
        return fft_shifted(subgrids)

    def _stage_planes(self, subgrids, screens=None):
        pplan = self.pplan
        plan = pplan.wplan
        image_size = plan.image_size
        sg_factor = (image_size / plan.subgrid_size) ** 2
        per_plane = {iw: jnp.zeros((image_size, image_size),
                                   jnp.complex64)
                     for iw in pplan.w_plane_ids}
        for t, task in enumerate(pplan.tasks):
            per_plane[task.iw] = subgrid_add_static(
                per_plane[task.iw], -task.iu * plan.eff_sg_size,
                -task.iv * plan.eff_sg_size, subgrids[t], sg_factor)
        planes = jnp.stack([per_plane[iw] for iw in pplan.w_plane_ids])
        return _planes_to_image(self._kernel, planes,
                                self._plane_offsets(), screens=screens)

    def _stack_to_layers(self, stack):
        """[T, 2, K*(G+8), G] stack-kernel output -> [T, K, G, G]
        complex layers (crop the always-zero 8-row octet overhang and
        combine the re/im planes — one cheap slice-copy pass, vs the
        254 MB window read the fold pass performed). ``T`` is taken
        from the stack (the sharded bodies pass per-shard stacks)."""
        pplan = self.pplan
        G = pplan.wplan.subgrid_size
        st = stack.reshape(stack.shape[0], 2, pplan.num_layers,
                           G + 8, G)[:, :, :, :G, :]
        return jax.lax.complex(st[:, 0], st[:, 1])

    def _layers_to_stack(self, layers):
        """[T, K, G, G] complex layers -> task-major [T, 2, K*(G+8),
        G] f32 stack (the v3 degrid kernels' input form; the 8-row
        u-pad mirrors _window_from_stack's sub_pad)."""
        pplan = self.pplan
        G = pplan.wplan.subgrid_size
        st = jnp.stack([layers.real.astype(jnp.float32),
                        layers.imag.astype(jnp.float32)], axis=1)
        st = jnp.pad(st, ((0, 0), (0, 0), (0, 0), (0, 8), (0, 0)))
        return st.reshape(layers.shape[0], 2,
                          pplan.num_layers * (G + 8), G)

    def _grid_impl(self, vre, vim, ops, block_bucket,
                   ladder, pref, screens):
        # No visited mask: every packed-plan task has >= 1 valid
        # visibility BY CONSTRUCTION (plan_packed enumerates tasks
        # from the per-visibility assignment), so every task's stack
        # is zero-initialised and accumulated by the kernel. The
        # STREAMING driver, whose per-chunk task occupancy is data-
        # dependent, applies its own per-task mask (_planes_core).
        out = self._stage_kernel(vre, vim, ops, block_bucket)
        layers = self._stack_to_layers(out)
        subgrids = self._stage_drain(layers, ladder, pref)
        return self._stage_planes(subgrids, screens)

    def _grid_indices(self):
        return (self.t_idx, self.k_idx, self.g_idx)

    def grid_sorted(self, vre: Array, vim: Array) -> Array:
        """Sorted-stream (re, im) f32 -> real dirty image (f32)."""
        return self._grid_jit(vre, vim, self._grid_ops,
                              self._grid_indices(),
                              self.ladder_grid,
                              self.pref_grid, self.screens_grid)

    def grid(self, vis: Array) -> Array:
        """[rows, chan] visibilities -> real dirty image."""
        vre, vim = self.sort(vis)
        return self.grid_sorted(vre, vim)

    # -- degrid ---------------------------------------------------------

    # Degrid pipeline stages (composable so report_timing_degrid can
    # measure marginal device time per stage).

    def _dstage_planes(self, image, screens=None):
        return _image_to_plane_stack(self._kernel, image,
                                     self._plane_offsets(),
                                     screens=screens)

    def _dstage_layers(self, plane_stack, ladder, pref):
        # Task-major stack layout [T, 2, K*(G+8), G] — the input form
        # of the v3 stack degrid kernels (each task's full tower rides
        # one resident input block; see packed_tap.degrid_stack_pallas).
        pplan = self.pplan
        plan = pplan.wplan
        sgs = plan.subgrid_size
        plane_pos = {iw: i for i, iw in enumerate(pplan.w_plane_ids)}
        subgrids = jnp.stack([
            subgrid_cut_out_static(
                plane_stack[plane_pos[task.iw]],
                task.iu * plan.eff_sg_size,
                task.iv * plan.eff_sg_size, sgs)
            for task in pplan.tasks]).astype(jnp.complex64)
        subgrids = ifft_shifted_norm(subgrids)
        layers = fft_shifted(
            (subgrids * pref)[:, None, :, :] * ladder[None])
        return self._layers_to_stack(layers)

    def _dstage_kernel(self, st, ops, block_bucket):
        # v3: windows are sliced in VMEM from the task's resident
        # tower stack (one input-block DMA per task) — the per-bucket
        # (8, 128)-tile fetches cost 64 KB per occupied bucket
        # (~250 MB per 1M-vis whole-image call).
        plan = self.pplan.wplan
        t_idx, k_idx, g_idx = block_bucket
        if self._compact:
            pa, uk_t, vk_t, wk_t = ops
            return degrid_compact_pallas(
                st, t_idx, k_idx, g_idx, pa, uk_t, vk_t, wk_t,
                plan.support, plan.w_support,
                block_v=self.pplan.block_v, fast=self.fast,
                interpret=self.interpret)
        if self._fused_degrid:
            pa, pb = ops
            return degrid_fused2_stack_pallas(
                st, t_idx, k_idx, g_idx, pa, pb, self._uv_c,
                self._w_c, plan.subgrid_size, plan.support,
                plan.w_support, plan.oversampling, plan.w_oversampling,
                block_v=self.pplan.block_v, precision=self.precision,
                interpret=self.interpret)
        wk_t, ubase, vband_t = ops
        return degrid_stack_pallas(
            st, t_idx, k_idx, g_idx, ubase, vband_t, wk_t,
            plan.w_support, block_v=self.pplan.block_v, fast=self.fast,
            interpret=self.interpret)

    def _degrid_impl(self, image, ops, block_bucket, ladder, pref,
                     screens):
        plane_stack = self._dstage_planes(image, screens)
        st = self._dstage_layers(plane_stack, ladder, pref)
        return self._dstage_kernel(st, ops, block_bucket)

    def _degrid_indices(self):
        return (self.t_idx, self.k_idx, self.g_idx)

    def degrid_sorted(self, image: Array) -> Array:
        """Real/complex image -> sorted-stream complex64 visibilities."""
        return self._degrid_jit(image, self._degrid_ops,
                                self._degrid_indices(),
                                self.ladder_degrid, self.pref_degrid,
                                self.screens_degrid)

    def degrid(self, image: Array) -> Array:
        """Image -> [rows, chan] complex64 visibilities."""
        return self.unsort(self.degrid_sorted(image))

    # -- stage timing report --------------------------------------------

    def report_timing(self, vre: Array, vim: Array, iters: int = 10,
                      print_fn=print):
        """Per-stage device-time report for one grid pass — the TPU
        analogue of the reference's per-run report
        (sdp_grid_wstack_wtower.cpp:169-213, CUDA-event timers).

        Each pipeline prefix is measured with chained executions and a
        final device->host readback (``block_until_ready`` returns
        before pipelined chains complete on tunnelled attachments);
        stage times are the marginal prefix deltas, recorded into a
        :class:`~ska_sdp_func_tpu.utility.timers.Timers` tree.
        """
        import time as _time

        from ..utility.timers import TimerType, Timers

        args = (self._grid_ops, self._grid_indices(),
                self.ladder_grid, self.pref_grid,
                self.screens_grid)

        def upto(n):
            # Each prefix returns a SCALAR reduction computed inside
            # the jit: returning a GB-scale intermediate as the jit
            # output keeps ~iters in-flight copies alive through the
            # chained loop (allocation churn measured 8x slower than
            # the full pipeline containing the same kernel).
            def red_in(x):
                if jnp.iscomplexobj(x):
                    return jnp.sum(jnp.abs(x.real)) \
                        + jnp.sum(jnp.abs(x.imag))
                return jnp.sum(jnp.abs(x))

            def f(vre, vim, ops, bb, ladder, pref,
                  screens):
                out = self._stage_kernel(vre, vim, ops, bb)
                if n == 0:
                    return red_in(out)
                layers = self._stack_to_layers(out)
                if n == 1:
                    return red_in(layers)
                subgrids = self._stage_drain(layers, ladder, pref)
                if n == 2:
                    return red_in(subgrids)
                return red_in(self._stage_planes(subgrids, screens))
            return jax.jit(f)

        fb = jax.jit(lambda v, s: v * (jnp.float32(1.0)
                                       + jnp.float32(1e-6) * jnp.tanh(s)))
        names = ("stack kernel", "stack -> layers",
                 "ifft + w ladder + fft", "subgrid adds + correction")
        prefix_t = []
        for n in range(4):
            f = upto(n)
            s = f(vre, *(vim,) + args)
            _ = float(s)
            v = vre
            # Two loops, keep the second: a freshly compiled
            # executable's FIRST timed loop runs ~7x slow (measured
            # 35 vs 5.2 ms/iter on the tunnelled chip) regardless of
            # process warm-up.
            for _loop in range(2):
                t0 = _time.perf_counter()
                for _i in range(iters):
                    s = f(v, *(vim,) + args)
                    v = fb(v, s)
                _ = float(s)
                dt = (_time.perf_counter() - t0) / iters
            prefix_t.append(dt)

        plan = self.pplan.wplan
        timers = Timers("grid_all (packed) device time / call",
                        TimerType.DEVICE)
        prev = 0.0
        for name, t in zip(names, prefix_t):
            timers.record(name, max(t - prev, 0.0))
            prev = t
        if print_fn is not None:
            print_fn(
                f"# image {plan.image_size}^2, subgrid "
                f"{plan.subgrid_size}, {len(self.pplan.tasks)} tasks, "
                f"{len(self.pplan.w_plane_ids)} w-planes, "
                f"{self.pplan.num_layers} tower layers, "
                f"{self.pplan.total} stream slots "
                f"({self.pplan.num_blocks} blocks), w_step "
                f"{plan.w_step}, tower height {plan.w_tower_height}")
        timers._root.timer.pause()
        timers._root.timer._elapsed = prefix_t[-1]
        timers.report(print_fn)
        return dict(zip(names, [max(b - a, 0.0) for a, b in
                                zip([0.0] + prefix_t[:-1], prefix_t)]))

    def report_timing_degrid(self, image: Array, iters: int = 10,
                             print_fn=print):
        """Per-stage device-time report for one degrid pass (the mirror
        of :meth:`report_timing`; same chained + readback methodology).
        """
        import time as _time

        from ..utility.timers import TimerType, Timers

        args = (self._degrid_ops,
                self._degrid_indices(), self.ladder_degrid,
                self.pref_degrid, self.screens_degrid)

        def upto(n):
            # Scalar reduction inside the jit — see report_timing.
            def red_in(x):
                if jnp.iscomplexobj(x):
                    return jnp.sum(jnp.abs(x.real)) \
                        + jnp.sum(jnp.abs(x.imag))
                return jnp.sum(jnp.abs(x))

            def f(img, ops, bb, ladder, pref, screens):
                planes = self._dstage_planes(img, screens)
                if n == 0:
                    return red_in(planes)
                st = self._dstage_layers(planes, ladder, pref)
                if n == 1:
                    return red_in(st)
                return red_in(self._dstage_kernel(st, ops, bb))
            return jax.jit(f)

        fbi = jax.jit(lambda m, s: m + jnp.float32(1e-6) * jnp.tanh(s))
        names = ("plane FFTs + screens", "cut-outs + ladder + layer fft",
                 "fused degrid kernel")
        prefix_t = []
        image = jnp.asarray(image, jnp.float32)
        for n in range(3):
            f = upto(n)
            s = f(image, *args)
            _ = float(s)
            img = image
            # Two loops, keep the second (fresh-executable first-loop
            # ramp; see report_timing).
            for _loop in range(2):
                t0 = _time.perf_counter()
                for _i in range(iters):
                    s = f(img, *args)
                    img = fbi(img, s)
                _ = float(s)
                dt = (_time.perf_counter() - t0) / iters
            prefix_t.append(dt)

        timers = Timers("degrid_all (packed) device time / call",
                        TimerType.DEVICE)
        prev = 0.0
        for name, t in zip(names, prefix_t):
            timers.record(name, max(t - prev, 0.0))
            prev = t
        timers._root.timer.pause()
        timers._root.timer._elapsed = prefix_t[-1]
        timers.report(print_fn)
        return dict(zip(names, [max(b - a, 0.0) for a, b in
                                zip([0.0] + prefix_t[:-1], prefix_t)]))

    # -- mesh-sharded drivers -------------------------------------------
    #
    # True O(V / n_chips) multi-chip ingest: the sorted block stream is
    # sharded contiguously across the mesh (plan with
    # ``pad_blocks_to=n_devices``); every chip runs the SAME packed
    # pipeline over its own blocks (its local visited mask keeps the
    # fold to its own buckets) and partial images reduce with `psum`
    # over ICI. This replaces the round-1 sharded driver's
    # O(tasks x V) per-task masking loop.

    def _mesh_key(self, mesh, axis_name):
        return (tuple(int(d.id) for d in mesh.devices.flat),
                tuple(mesh.axis_names), axis_name)

    def _check_mesh(self, mesh):
        # compact/'high' gridders never reach here: the sharded entry
        # points delegate them to a plain-band 'highest' sibling first
        # (the sharded bodies consume the plain band operand format).
        ndev = int(mesh.devices.size)
        if self.pplan.num_blocks % ndev:
            raise SdpInvalidArgumentError(
                f"num_blocks ({self.pplan.num_blocks}) not divisible by "
                f"{ndev} devices — build the plan with "
                f"pad_blocks_to={ndev}")

    def _shard_meta(self, n: int):
        """Host metadata for the task-sharded mesh drivers.

        Blocks shard contiguously, and blocks are bucket-sorted with
        the task index major — so each shard's blocks reference a
        CONTIGUOUS task range. The fold/drain stages then run over at
        most ``Tp = max_s(tasks touched by shard s)`` tasks per shard
        instead of all T: without this, every chip re-ran the full
        per-task FFT drain and the iteration rate stopped scaling once
        T-sized drain work matched the sharded kernel work.
        """
        meta = self._shard_meta_cache.get(n)
        if meta is not None:
            return meta
        from ..utility.device import device_put

        pplan = self.pplan
        S, G, Kmax = pplan.num_slabs, pplan.num_octets, pplan.num_layers
        NB = pplan.num_blocks
        bps = NB // n
        bb = pplan.arrays["block_bucket"].astype(np.int64)
        task_of_block = bb // (S * G)
        slab_of_block = (bb // G) % S
        t0 = task_of_block[0::bps][:n]
        t1 = task_of_block[bps - 1::bps][:n]
        tp = int((t1 - t0 + 1).max())

        base = (t0 * S * G).repeat(bps)
        bb_local = (bb - base).astype(np.int32)
        p_idx_local = ((task_of_block - t0.repeat(bps)) * Kmax
                       + slab_of_block).astype(np.int32)

        plan = pplan.wplan
        plane_ids = list(pplan.w_plane_ids)
        plane_pos = {iw: i for i, iw in enumerate(plane_ids)}
        T = len(pplan.tasks)
        iu_eff = np.zeros(n * tp, np.int32)
        iv_eff = np.zeros(n * tp, np.int32)
        pidx = np.zeros(n * tp, np.int32)
        vmask = np.zeros(n * tp, bool)
        for s in range(n):
            for j in range(tp):
                t = int(t0[s]) + j
                if t > int(t1[s]) or t >= T:
                    continue
                task = pplan.tasks[t]
                iu_eff[s * tp + j] = task.iu * plan.eff_sg_size
                iv_eff[s * tp + j] = task.iv * plan.eff_sg_size
                pidx[s * tp + j] = plane_pos[task.iw]
                vmask[s * tp + j] = True

        sgs = plan.subgrid_size
        zpad = np.zeros((tp, sgs, sgs), np.complex64)
        meta = dict(
            tp=tp,
            bb_local=jnp.asarray(bb_local),
            p_idx_local=jnp.asarray(p_idx_local),
            t0=jnp.asarray(t0.astype(np.int32)),
            iu_eff=jnp.asarray(iu_eff),
            iv_eff=jnp.asarray(iv_eff),
            pidx=jnp.asarray(pidx),
            vmask=jnp.asarray(vmask),
            pref_g_pad=device_put(
                np.concatenate([self._pref_g_host, zpad])),
            pref_d_pad=device_put(
                np.concatenate([self._pref_d_host, zpad])),
        )
        self._shard_meta_cache[n] = meta
        return meta

    def _plane_offsets(self):
        plan = self.pplan.wplan
        return [int(np.trunc(iw * plan.w_tower_height))
                for iw in self.pplan.w_plane_ids]

    def grid_sorted_sharded(self, vre: Array, vim: Array, mesh,
                            axis_name: str = "rows") -> Array:
        from jax.sharding import PartitionSpec as P

        if self.precision == "high" or self._compact:
            # The mesh-sharded bodies consume the plain band operand
            # format; delegate to a plain-band sibling (value-cached).
            # NOTE: the sibling holds its OWN f32 band arrays — a
            # 'high' gridder used for sharded work keeps ~2x band HBM
            # resident (bounded by the gridder LRU). Build with
            # precision='highest' directly if sharded use dominates.
            alt = packed_gridder(self.pplan, fast=self.fast,
                                 precision="highest", engine="bands")
            return alt.grid_sorted_sharded(vre, vim, mesh, axis_name)

        self._check_mesh(mesh)
        key = ("grid", self._mesh_key(mesh, axis_name))
        fn = self._sharded_cache.get(key)
        n = int(mesh.devices.size)
        meta = self._shard_meta(n)
        if fn is None:
            pplan = self.pplan
            plan = pplan.wplan
            sgs = plan.subgrid_size
            N = plan.image_size
            S, G = pplan.num_slabs, pplan.num_octets
            tp = meta["tp"]
            sg_factor = (N / sgs) ** 2
            num_p = len(self._plane_offsets())
            w_offsets = self._plane_offsets()
            kernel = self._kernel

            def body(vre_c, vim_c, ops, bb_loc_c,
                     t0_c, iu_c, iv_c, pl_c, vm_c, ladder, pref_pad):
                # v3 stack kernels, shard-local: per-block (task,
                # slab, octet) derive from the local block->bucket
                # map; tasks with no blocks in this shard are masked
                # (their stacks are never visited) and straddled
                # tasks sum through the planes psum.
                t_loc = bb_loc_c // (S * G)
                k_loc = (bb_loc_c // G) % S
                g_loc = bb_loc_c % G
                if self._fused_grid:
                    pa_c, pb_c = ops
                    stack = grid_fused_stack_pallas(
                        t_loc, k_loc, g_loc, pa_c, pb_c, vre_c, vim_c,
                        self._uv_c, self._w_c, tp, pplan.num_layers,
                        sgs, plan.support, plan.w_support,
                        plan.oversampling, plan.w_oversampling,
                        block_v=pplan.block_v,
                        precision=self.precision,
                        interpret=self.interpret)
                else:
                    wkt_c, ubase_c, vband_c = ops
                    stack = grid_packed_stack_pallas(
                        t_loc, k_loc, g_loc, ubase_c, vband_c,
                        (wkt_c, vre_c, vim_c), tp, pplan.num_layers,
                        sgs, plan.w_support, block_v=pplan.block_v,
                        fast=self.fast, interpret=self.interpret)
                layers = self._stack_to_layers(stack)
                # Defense-in-depth: with contiguous block sharding
                # every task in [t0, t1] has >= 1 local block, so
                # this duplicates the vm_c masking in the canvas scan
                # — kept so a degenerate plan can never leak an
                # uninitialised stack.
                tvis = jnp.zeros((tp,), bool).at[t_loc].set(True)
                layers = jnp.where(tvis[:, None, None, None],
                                   layers, 0)
                z = jnp.zeros((), t0_c.dtype)
                pref_local = jax.lax.dynamic_slice(
                    pref_pad, (t0_c[0], z, z), (tp, sgs, sgs))
                subgrids = self._stage_drain(layers, ladder, pref_local)

                # Shard-local wrap-around adds onto a halo canvas; the
                # halo folds back once, so the per-task offsets can be
                # traced (dynamic) without scatter lowering.
                canvas = jnp.zeros((num_p, N + sgs, N + sgs),
                                   jnp.complex64)

                def step(c, xs):
                    sub, iu, iv, pid, vm = xs
                    su = jnp.mod(N // 2 - sgs // 2 + iu, N)
                    sv = jnp.mod(N // 2 - sgs // 2 + iv, N)
                    patch = jax.lax.dynamic_slice(
                        c, (pid, su, sv), (1, sgs, sgs))
                    contrib = jnp.where(
                        vm, (sub * sg_factor).astype(c.dtype), 0)
                    return jax.lax.dynamic_update_slice(
                        c, patch + contrib[None], (pid, su, sv)), None

                canvas, _ = jax.lax.scan(
                    step, canvas, (subgrids, iu_c, iv_c, pl_c, vm_c))
                planes = canvas[:, :N, :] \
                    .at[:, :sgs, :].add(canvas[:, N:, :])
                planes = planes[:, :, :N] \
                    .at[:, :, :sgs].add(planes[:, :, N:])
                planes = jax.lax.psum(planes, axis_name)
                return _planes_to_image(kernel, planes, w_offsets)

            ops_specs = ((P(axis_name), P(axis_name)) if self._fused_grid
                         else (P(None, axis_name), P(None, axis_name),
                               P(axis_name)))
            fn = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(axis_name), P(axis_name), ops_specs,
                          P(axis_name),
                          P(axis_name), P(axis_name), P(axis_name),
                          P(axis_name), P(axis_name), P(), P()),
                out_specs=P(), check_vma=False))
            self._sharded_cache[key] = fn
        return fn(vre, vim, self._grid_ops,
                  meta["bb_local"], meta["t0"], meta["iu_eff"],
                  meta["iv_eff"], meta["pidx"], meta["vmask"],
                  self.ladder_grid, meta["pref_g_pad"])

    def grid_sharded(self, vis: Array, mesh,
                     axis_name: str = "rows") -> Array:
        vre, vim = self.sort(jnp.asarray(vis))
        return self.grid_sorted_sharded(vre, vim, mesh, axis_name)

    def degrid_sorted_sharded(self, image: Array, mesh,
                              axis_name: str = "rows") -> Array:
        if self.precision == "high" or self._compact:
            alt = packed_gridder(self.pplan, fast=self.fast,
                                 precision="highest", engine="bands")
            return alt.degrid_sorted_sharded(image, mesh, axis_name)
        from jax.sharding import PartitionSpec as P

        self._check_mesh(mesh)
        key = ("degrid", self._mesh_key(mesh, axis_name))
        fn = self._sharded_cache.get(key)
        n = int(mesh.devices.size)
        meta = self._shard_meta(n)
        if fn is None:
            pplan = self.pplan
            plan = pplan.wplan
            sgs = plan.subgrid_size
            N = plan.image_size
            tp = meta["tp"]
            w_offsets = self._plane_offsets()
            kernel = self._kernel

            def body(image_r, ops, p_loc_c, g_c,
                     t0_c, iu_c, iv_c, pl_c, ladder, pref_pad):
                # Replicated per-plane FFTs (few planes, image-sized,
                # batched); everything per-task below runs on the
                # shard's own task range only.
                plane_stack = _image_to_plane_stack(kernel, image_r,
                                                    w_offsets)
                canvas = jnp.zeros(
                    (plane_stack.shape[0], N + sgs, N + sgs),
                    jnp.complex64)
                canvas = canvas.at[:, :N, :N].set(plane_stack)
                canvas = canvas.at[:, N:, :N].set(plane_stack[:, :sgs])
                canvas = canvas.at[:, :N, N:].set(
                    plane_stack[:, :, :sgs])
                canvas = canvas.at[:, N:, N:].set(
                    plane_stack[:, :sgs, :sgs])

                def cut(iu, iv, pid):
                    su = jnp.mod(N // 2 - sgs // 2 + iu, N)
                    sv = jnp.mod(N // 2 - sgs // 2 + iv, N)
                    return jax.lax.dynamic_slice(
                        canvas, (pid, su, sv), (1, sgs, sgs))[0]

                subgrids = jax.vmap(cut)(iu_c, iv_c, pl_c)
                subgrids = ifft_shifted_norm(subgrids)
                z = jnp.zeros((), t0_c.dtype)
                pref_local = jax.lax.dynamic_slice(
                    pref_pad, (t0_c[0], z, z), (tp, sgs, sgs))
                layers = fft_shifted(
                    (subgrids * pref_local)[:, None, :, :]
                    * ladder[None])
                # Task-major stack layout for the v3 stack degrid
                # kernels (shard-local tasks; p_loc_c = local_task *
                # Kmax + slab, so t/k derive by divmod).
                st = self._layers_to_stack(layers)
                t_loc = p_loc_c // pplan.num_layers
                k_loc = p_loc_c % pplan.num_layers
                if self._fused_degrid:
                    pa_c, pb_c = ops
                    return degrid_fused2_stack_pallas(
                        st, t_loc, k_loc, g_c, pa_c, pb_c, self._uv_c,
                        self._w_c, sgs, plan.support, plan.w_support,
                        plan.oversampling, plan.w_oversampling,
                        block_v=pplan.block_v, precision=self.precision,
                        interpret=self.interpret)
                wkt_c, ubase_c, vbt_c = ops
                return degrid_stack_pallas(
                    st, t_loc, k_loc, g_c, ubase_c, vbt_c, wkt_c,
                    plan.w_support, block_v=pplan.block_v,
                    fast=self.fast, interpret=self.interpret)

            ops_specs = ((P(axis_name), P(axis_name)) if self._fused_degrid
                         else (P(None, axis_name), P(None, axis_name),
                               P(None, axis_name)))
            fn = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), ops_specs,
                          P(axis_name), P(axis_name),
                          P(axis_name), P(axis_name), P(axis_name),
                          P(axis_name), P(), P()),
                out_specs=P(axis_name), check_vma=False))
            self._sharded_cache[key] = fn
        return fn(image, self._degrid_ops,
                  meta["p_idx_local"], self.g_idx,
                  meta["t0"], meta["iu_eff"], meta["iv_eff"],
                  meta["pidx"], self.ladder_degrid, meta["pref_d_pad"])

    def degrid_sharded(self, image: Array, mesh,
                       axis_name: str = "rows") -> Array:
        return self.unsort(
            self.degrid_sorted_sharded(image, mesh, axis_name))


# ---------------------------------------------------------------------------
# Functional API (parity with the round-1 bucketed drivers)
# ---------------------------------------------------------------------------


def grid_all_packed(pplan: PackedPlan, vis: Array,
                    fast: bool = False,
                    precision: str = None) -> Array:
    """Whole-image gridding through the packed path. Returns the real
    dirty image (f32)."""
    return packed_gridder(pplan, fast,
                          precision=precision).grid(jnp.asarray(vis))


def degrid_all_packed(pplan: PackedPlan, image: Array,
                      fast: bool = False,
                      precision: str = None) -> Array:
    """Whole-image degridding through the packed path. Returns
    [rows, chan] complex64 visibilities."""
    return packed_gridder(pplan, fast,
                          precision=precision).degrid(jnp.asarray(image))


def grid_all_packed_sharded(pplan: PackedPlan, vis: Array, mesh,
                            axis_name: str = "rows",
                            fast: bool = False) -> Array:
    """Mesh-sharded packed gridding (blocks sharded, images psum'd).
    The plan must be built with ``pad_blocks_to=mesh.devices.size``."""
    return packed_gridder(pplan, fast).grid_sharded(vis, mesh, axis_name)


def degrid_all_packed_sharded(pplan: PackedPlan, image: Array, mesh,
                              axis_name: str = "rows",
                              fast: bool = False) -> Array:
    """Mesh-sharded packed degridding (replicated image, sharded
    blocks)."""
    return packed_gridder(pplan, fast).degrid_sharded(image, mesh,
                                                      axis_name)
