"""Packed (bucket-sorted, band-streaming) execution of the ES-FFT
gridder — the TPU performance path behind
:class:`~ska_sdp_func_tpu.grid_data.es_fft.GridderUvwEsFft`.

The ES gridder has exactly the w-towers tap structure (separable
support^2 uv taps x a ``support``-plane exp-semicircle w window), so it
reuses the generic packed kernels (kernels/packed_tap.py). Differences
from the w-towers driver (parallel/packed.py):

- the "subgrid" is the FULL padded uv grid (G up to thousands), so the
  v axis is bucketed too: buckets are (w-slab k0, u-octet, v-128-block)
  and windows are ``[2*support*16, 256]`` (256 lanes = aligned 128
  block + straddle);
- a dense window array over ALL buckets would be O(GB), so the kernel
  runs once per w-slab over that slab's contiguous block range with a
  slab-local dense window array (~hundreds of MB, reused by XLA's
  allocator across slabs);
- visibilities with w < 0 are flipped (conjugated) per the reference
  kernel (sdp_gridder_uvw_es_fft_kernels.cu:127-277); the flip sign
  rides the plan.

Built once at plan construction from the plan's uvw/freq arrays (the
reference plan is likewise bound to its arrays); executing with
*different* uvw than the plan was built from is undefined, as in the
reference. Visibilities whose uv footprint leaves the padded grid are
dropped (counted in ``num_clipped``) — the oracle path clips single
taps instead, but the 2x-padded grid means in-range data never clips.
"""

import functools

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..kernels.packed_tap import (
    WIN_ROWS,
    build_bands,
    degrid_fused_pallas,
    grid_packed_pallas,
)

Array = jax.Array

_LANES = 256          # aligned 128-lane block + straddle


def _es_np(beta, x):
    inside = np.abs(x) <= 1.0
    safe = np.where(inside, x, 0.0)
    return np.where(inside,
                    np.exp(beta * (np.sqrt(1.0 - safe * safe) - 1.0)),
                    0.0)


@dataclass
class EsPackedPlan:
    """Host bucketing + device bands for one ES-FFT plan."""

    total: int
    num_blocks: int
    block_v: int
    num_w_grids: int
    w_support: int           # ES w-window = uv support (1 in 2D)
    num_slabs: int
    gu: int                  # u octet blocks
    gv: int                  # v 128-lane blocks
    rows_pad: int
    lanes_pad: int
    slab_blocks: List[Tuple[int, int]]      # per-slab block ranges
    num_clipped: int
    arrays: Dict[str, np.ndarray] = field(repr=False, default=None)
    # Device arrays, uploaded lazily on first use.
    _dev: dict = field(repr=False, default=None)
    _jits: dict = field(repr=False, default_factory=dict)

    def device(self):
        # Materialised eagerly at plan build: running this lazily under
        # a user's jit would cache TRACERS and poison later calls.
        if self._dev is None:
            a = self.arrays
            ubase, vband, vband_t = build_bands(
                jnp.asarray(a["u_off"]), jnp.asarray(a["iv0_local"]),
                jnp.asarray(a["uk"]), jnp.asarray(a["vk"]), _LANES)
            self._dev = dict(
                sort_index=jnp.asarray(a["sort_index"].astype(np.int32)),
                valid=jnp.asarray(a["valid"]),
                flip=jnp.asarray(a["flip"]),
                kw_t=jnp.asarray(np.ascontiguousarray(a["kw"].T)),
                block_bucket=jnp.asarray(a["block_bucket"]),
                inv_index=jnp.asarray(a["inv_index"].astype(np.int32)),
                k_idx=jnp.asarray(a["k_idx"]),
                g_idx=jnp.asarray(a["g_idx"]),
                hv_idx=jnp.asarray(a["hv_idx"]),
                visited=jnp.asarray(a["visited"]),
                ubase=ubase, vband=vband, vband_t=vband_t)
        return self._dev


def _build_screens(plan, sign: float):
    """[K, size, size] c64 stack of exp(sign 2 pi i w (n-1))/n — static
    per plan; rebuilding these per call costs ~2M transcendentals per
    w-plane."""
    outs = []
    for iw in range(plan.num_total_w_grids):
        plane_w = iw * plan.inv_w_scale + plan.min_plane_w
        screen, _ = plan._image_screens(plane_w, sign)
        outs.append(screen.astype(jnp.complex64))
    return jnp.stack(outs)


def build_es_packed_plan(plan, uvw: np.ndarray, freq: np.ndarray,
                         block_v: int = 128):
    """Host bucketing for a GridderUvwEsFft plan (f64 NumPy).

    Returns None when the geometry can't use the packed path
    (support > 8 — double-precision plans keep the oracle path).
    """
    support = plan.support
    if support > 8:
        return None
    G = plan.grid_size
    hs = support / 2.0
    sw = support if plan.do_wstacking else 1
    K = plan.num_total_w_grids
    num_slabs = max(K - sw + 1, 1)

    from ..utility.device import to_host

    uvw = to_host(uvw, np.float64)
    freq = to_host(freq, np.float64)
    R, C = uvw.shape[0], freq.shape[0]
    from ..utility.constants import C_0

    flip = np.where(uvw[:, 2] < 0, -1.0, 1.0) if plan.do_wstacking \
        else np.ones(R)
    inv_wave = flip[:, None] * freq[None, :] / C_0            # [R, C]
    pos_u = uvw[:, 0:1] * inv_wave * plan.uv_scale
    pos_v = uvw[:, 1:2] * inv_wave * plan.uv_scale
    if plan.do_wstacking:
        pos_w = (uvw[:, 2:3] * inv_wave - plan.min_plane_w) * plan.w_scale
    else:
        pos_w = np.zeros_like(pos_u)

    u0 = np.ceil(pos_u - hs).astype(np.int64)
    v0 = np.ceil(pos_v - hs).astype(np.int64)
    iu0 = (u0 + G // 2).ravel()
    iv0 = (v0 + G // 2).ravel()
    ok = ((iu0 >= 0) & (iu0 <= G - support)
          & (iv0 >= 0) & (iv0 <= G - support))
    num_clipped = int((~ok).sum())
    iu0c = np.clip(iu0, 0, G - support)
    iv0c = np.clip(iv0, 0, G - support)

    k = np.arange(support)
    uk = _es_np(plan.beta,
                ((u0[..., None] + k) - pos_u[..., None]) / hs) \
        .reshape(-1, support).astype(np.float32)
    vk = _es_np(plan.beta,
                ((v0[..., None] + k) - pos_v[..., None]) / hs) \
        .reshape(-1, support).astype(np.float32)
    if plan.do_wstacking:
        k0 = np.clip(np.ceil(pos_w - hs).astype(np.int64), 0,
                     K - sw).ravel()
        kw = _es_np(plan.beta,
                    ((k0.reshape(R, C)[..., None] + np.arange(sw))
                     - pos_w[..., None]) / hs) \
            .reshape(-1, sw).astype(np.float32)
    else:
        k0 = np.zeros(R * C, np.int64)
        kw = np.ones((R * C, 1), np.float32)

    gu_blocks = -(-G // 8)
    gv_blocks = -(-G // 128)
    rows_pad = 8 * gu_blocks + 8
    lanes_pad = 128 * gv_blocks + 128
    gu = iu0c >> 3
    hv = iv0c >> 7
    u_off = (iu0c & 7).astype(np.int32)
    iv0_local = (iv0c & 127).astype(np.int32)

    slab_sz = gu_blocks * gv_blocks
    bucket = (k0 * slab_sz + gu * gv_blocks + hv)
    num_buckets = num_slabs * slab_sz

    counts = np.bincount(bucket, minlength=num_buckets)
    padded = -(-counts // block_v) * block_v
    pad_off = np.zeros(num_buckets + 1, np.int64)
    np.cumsum(padded, out=pad_off[1:])
    total = int(pad_off[-1])
    num_blocks = total // block_v

    order = np.argsort(bucket, kind="stable")
    sstart = np.zeros(num_buckets, np.int64)
    np.cumsum(counts[:-1], out=sstart[1:])
    rank = np.arange(R * C) - sstart[bucket[order]]
    dest = pad_off[bucket[order]] + rank

    sort_index = np.zeros(total, np.int64)
    valid = np.zeros(total, bool)
    sort_index[dest] = order
    valid[dest] = True
    valid[dest[~ok[order]]] = False          # clipped vis dropped

    def scatter(x):
        out = np.zeros((total,) + x.shape[1:], x.dtype)
        out[dest] = x[order]
        return out

    from ..parallel.bucketed import inverse_index_of

    arrays = dict(
        sort_index=sort_index, valid=valid,
        inv_index=inverse_index_of(sort_index, valid, R * C),
        u_off=scatter(u_off), iv0_local=scatter(iv0_local),
        uk=scatter(uk), vk=scatter(vk),
        kw=np.where(valid[:, None], scatter(kw), 0.0).astype(np.float32),
        flip=scatter(flip.repeat(C).astype(np.float32)),
    )

    nonzero = np.nonzero(padded)[0]
    block_bucket_g = np.repeat(nonzero, padded[nonzero] // block_v)
    # Slab-local bucket ids for the per-slab kernel invocations.
    arrays["block_bucket"] = (block_bucket_g % slab_sz).astype(np.int32)
    # Per-block (w-slab, u-octet, v-128-block) coordinates for the
    # fused degrid kernel's window-tile index maps.
    arrays["k_idx"] = (block_bucket_g // slab_sz).astype(np.int32)
    arrays["g_idx"] = ((block_bucket_g % slab_sz)
                       // gv_blocks).astype(np.int32)
    arrays["hv_idx"] = (block_bucket_g % gv_blocks).astype(np.int32)
    visited = np.zeros((num_slabs, slab_sz), bool)
    visited[np.nonzero(counts)[0] // slab_sz,
            np.nonzero(counts)[0] % slab_sz] = True
    arrays["visited"] = visited

    slab_of_block = block_bucket_g // slab_sz
    slab_blocks = []
    for s in range(num_slabs):
        sel = np.nonzero(slab_of_block == s)[0]
        if sel.size:
            slab_blocks.append((int(sel[0]), int(sel[-1] + 1)))
        else:
            slab_blocks.append((0, 0))

    ep = EsPackedPlan(
        total=total, num_blocks=num_blocks, block_v=block_v,
        num_w_grids=K, w_support=sw, num_slabs=num_slabs,
        gu=gu_blocks, gv=gv_blocks, rows_pad=rows_pad,
        lanes_pad=lanes_pad, slab_blocks=slab_blocks,
        num_clipped=num_clipped, arrays=arrays)
    dev = ep.device()
    dev["screens_grid"] = jax.jit(
        lambda: _build_screens(plan, -1.0))()
    dev["screens_degrid"] = jax.jit(
        lambda: _build_screens(plan, 1.0))()
    dev["correction"] = jax.jit(
        lambda: plan._correction(jnp.float32))()
    return ep


# ---------------------------------------------------------------------------
# Window fold / unfold on the (u-octet, v-128-block) bucket grid
# ---------------------------------------------------------------------------


def _fold_slab(wins, visited_s, gu, gv, sw, rows_pad, lanes_pad):
    """[2*sw, gu*gv, 16, 256] windows -> [2, sw, rows_pad, lanes_pad]."""
    w = jnp.where(visited_s[None, :, None, None], wins,
                  jnp.zeros((), wins.dtype))
    w = w.reshape(2, sw, gu, gv, WIN_ROWS, 2, 128)
    # u axis: rows >= 8 belong to octet gu+1.
    out_u = jnp.zeros((2, sw, gu + 1, gv, 8, 2, 128), jnp.float32)
    out_u = out_u.at[:, :, :gu].add(w[:, :, :, :, :8])
    out_u = out_u.at[:, :, 1:].add(w[:, :, :, :, 8:])
    # v axis: lane half >= 128 belongs to block hv+1.
    out = jnp.zeros((2, sw, gu + 1, gv + 1, 8, 128), jnp.float32)
    out = out.at[:, :, :, :gv].add(out_u[..., 0, :])
    out = out.at[:, :, :, 1:].add(out_u[..., 1, :])
    # -> [2, sw, rows_pad, lanes_pad]
    out = jnp.moveaxis(out, 4, 3)
    return out.reshape(2, sw, rows_pad, lanes_pad)


# ---------------------------------------------------------------------------
# Drivers (called from GridderUvwEsFft under jit)
# ---------------------------------------------------------------------------


def grid_es_packed(plan, ep: EsPackedPlan, uvw, freq_hz, vis, weight,
                   dirty_image, interpret: bool) -> Array:
    """Packed twin of GridderUvwEsFft.grid_uvw_es_fft.

    Self-jitted with the plan's device arrays as ARGUMENTS: embedding
    them as closure constants would ship hundreds of MB through the
    tunnel's compile endpoint (HTTP 413). Do not wrap the public
    method in another jit around large plans for the same reason.
    """
    dev = ep.device()
    key = ("grid", interpret)
    fn = ep._jits.get(key)
    if fn is None:
        fn = jax.jit(functools.partial(_grid_es_impl, plan, ep,
                                       interpret))
        ep._jits[key] = fn
    return fn(vis, weight, dirty_image, dev["sort_index"],
              dev["valid"], dev["flip"], dev["kw_t"],
              dev["block_bucket"], dev["ubase"], dev["vband"],
              dev["screens_grid"], dev["correction"])


def _grid_es_impl(plan, ep, interpret, vis, weight, dirty_image,
                  sort_index, valid, flip, kw_t, block_bucket, ubase,
                  vband, screens, correction):
    G = plan.grid_size
    size = plan.image_size
    sw = ep.w_support
    lo = G // 2 - size // 2

    vis_w = vis * weight.astype(vis.dtype)
    vis_s = vis_w.reshape(-1)[sort_index]
    vre = jnp.where(valid, vis_s.real, 0.0).astype(jnp.float32)
    vim = jnp.where(valid, vis_s.imag * flip, 0.0) \
        .astype(jnp.float32)
    # Split-scales kernel form: kw_t [Sw, V] + vre/vim stream into
    # the kernel and the scale stack is built in VMEM (the pre-built
    # stack cost an extra per-call XLA pass; the kernel is
    # bandwidth-bound — see packed_tap._grid_kernel_split).

    dirty = jnp.zeros((size, size), jnp.float32)
    acc = jnp.zeros((2, ep.num_w_grids, ep.rows_pad, ep.lanes_pad),
                    jnp.float32)
    bv = ep.block_v
    for s, (b0, b1) in enumerate(ep.slab_blocks):
        if b1 == b0:
            continue
        sl = slice(b0 * bv, b1 * bv)
        wins = grid_packed_pallas(
            jax.lax.slice_in_dim(block_bucket, b0, b1, axis=0),
            ubase[:, sl], vband[sl],
            (kw_t[:, sl], vre[sl], vim[sl]), ep.gu * ep.gv, _LANES,
            sw, block_v=bv, interpret=interpret)
        contrib = _fold_slab(wins, jnp.asarray(ep.arrays["visited"][s]),
                             ep.gu, ep.gv, sw, ep.rows_pad, ep.lanes_pad)
        acc = acc.at[:, s:s + sw].add(contrib)

    grid_c = jax.lax.complex(acc[0, :, :G, :G], acc[1, :, :G, :G])
    from ..fourier_transforms.fft import ifft_shifted

    layers = ifft_shifted(grid_c)
    crops = jax.lax.dynamic_slice(
        layers, (0, lo, lo), (ep.num_w_grids, size, size))
    dirty = jnp.sum((crops * screens).real, axis=0).astype(dirty.dtype)
    dirty = dirty * correction
    return dirty_image + dirty.astype(dirty_image.dtype)


def degrid_es_packed(plan, ep: EsPackedPlan, uvw, freq_hz, vis, weight,
                     dirty_image, interpret: bool) -> Array:
    """Packed twin of GridderUvwEsFft.ifft_degrid_uvw_es_fft
    (self-jitted; see grid_es_packed)."""
    dev = ep.device()
    key = ("degrid", interpret)
    fn = ep._jits.get(key)
    if fn is None:
        fn = jax.jit(functools.partial(_degrid_es_impl, plan, ep,
                                       interpret))
        ep._jits[key] = fn
    return fn(vis, dirty_image, dev["inv_index"],
              dev["flip"], dev["kw_t"], dev["k_idx"], dev["g_idx"],
              dev["hv_idx"], dev["ubase"], dev["vband_t"],
              dev["screens_degrid"], dev["correction"])


def _degrid_es_impl(plan, ep, interpret, vis, dirty_image, inv_index,
                    flip, kw_t, k_idx, g_idx, hv_idx, ubase,
                    vband_t, screens, correction):
    from ..fourier_transforms.fft import fft_shifted
    G = plan.grid_size
    size = plan.image_size
    sw = ep.w_support
    lo = G // 2 - size // 2
    cdtype = vis.dtype

    corrected = dirty_image.astype(jnp.float32) * correction
    # Per-plane screened layers -> forward FFT -> padded (u, v) layout.
    stack = (corrected[None] * screens).astype(jnp.complex64)
    layer = jnp.zeros((ep.num_w_grids, G, G), jnp.complex64) \
        .at[:, lo:lo + size, lo:lo + size].set(stack)
    grids = fft_shifted(layer)
    padded = jnp.zeros((2, ep.num_w_grids, ep.rows_pad, ep.lanes_pad),
                       jnp.float32)
    padded = padded.at[0, :, :G, :G].set(grids.real.astype(jnp.float32))
    padded = padded.at[1, :, :G, :G].set(grids.imag.astype(jnp.float32))

    # One fused kernel over ALL blocks: each bucket's window streams in
    # as 4*sw aligned tiles of `padded` (no dense window array, no
    # unfold, no per-slab Python loop).
    out = degrid_fused_pallas(
        padded, k_idx, g_idx, hv_idx, ubase, vband_t, kw_t, sw,
        block_v=ep.block_v, interpret=interpret)

    # Undo the w<0 flip (conjugate), unsort, drop pads/clipped. The
    # unsort is a GATHER through the host-precomputed inverse
    # permutation (a 262k-element XLA scatter costs ~15 ms on the
    # attached chip; the gather is bandwidth-bound); dropped entries
    # point at the guaranteed-zero one-past-the-end slot.
    out = jnp.where(flip < 0, jnp.conj(out), out)
    out_padded = jnp.concatenate(
        [out, jnp.zeros((1,), jnp.complex64)])
    flat = out_padded[inv_index]
    return vis + flat.reshape(vis.shape).astype(cdtype)
