"""Fused Pallas TPU kernels for the w-towers inner tap.

Same banded-matmul algebra as :mod:`.dense_tap` (see there for the
derivation), but the [V, N] band matrices are built **in VMEM** inside
the kernel and fed straight to the MXU — they never touch HBM. Per
visibility the kernel streams only ~100 B (tap rows, cell indices,
scaled values) instead of ~1 KB of materialized bands, turning the
HBM-bound XLA formulation into an MXU-bound one.

Layout per chunk of B visibilities (grid = V/B, sequential on-core):

  grid:    au_t = band(iu0, uk)^T  [N, B]   (vis on lanes — natural MXU
           av   = band(iv0, vk)    [B, N]    layout, no register transpose)
           out[p] += (au_t * scales_t[p]) @ av          (MXU)
  degrid:  t = au @ sub[p]; vis[p] += sum_w(t * av)     (MXU + row-reduce)

The output block index_map is constant, so the accumulator lives in VMEM
across all grid steps (TPU grid steps execute sequentially on a core).
Matmuls run at Precision.HIGHEST by default — the MXU's single-pass
bf16 path costs ~1e-3 relative error, far above the framework's
accuracy budget; pass ``fast=True`` to trade precision for ~3x speed.

Reference CUDA equivalents: sdp_gridder_wtower_uvw.cu (one thread per
row, atomicAdd scatter) — the TPU version replaces atomics with the
dense-band reformulation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _build_band(i0_col, taps_ref, num_v: int, size: int, support: int):
    """band[v, u] = taps[v, u - i0[v]] for u in [i0, i0+S) — 8
    compare-selects, no gather. i0_col: [B, 1]; taps_ref: [B, S]."""
    col = jax.lax.broadcasted_iota(jnp.int32, (num_v, size), 1)
    band = jnp.zeros((num_v, size), jnp.float32)
    for s in range(support):
        band = band + jnp.where(col == i0_col + s,
                                taps_ref[:, s:s + 1],
                                jnp.zeros((), jnp.float32))
    return band


def _build_band_t(i0_row, taps_t_ref, num_v: int, size: int, support: int):
    """band_t[u, v] = taps_t[u - i0[v], v] — transposed build (vis on
    lanes). i0_row: [1, B]; taps_t_ref: [S, B]."""
    row = jax.lax.broadcasted_iota(jnp.int32, (size, num_v), 0)
    band = jnp.zeros((size, num_v), jnp.float32)
    for s in range(support):
        band = band + jnp.where(row == i0_row + s,
                                taps_t_ref[s:s + 1, :],
                                jnp.zeros((), jnp.float32))
    return band


def _grid_kernel(flags_ref, iu0_ref, iv0_ref, ukt_ref, vk_ref, scales_ref,
                 out_ref, *, support: int, num_p: int, precision):
    step = pl.program_id(0)
    num_v = vk_ref.shape[0]
    size = out_ref.shape[-1]

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Per-(block, layer) skip flags (scalar-prefetched): with w-sorted
    # rows most blocks only touch ~w_support of the K layers — skip the
    # other dots entirely.
    @pl.when(flags_ref[step, num_p] != 0)
    def _():
        au_t = _build_band_t(iu0_ref[:], ukt_ref, num_v, size, support)
        av = _build_band(iv0_ref[:], vk_ref, num_v, size, support)
        for p in range(num_p):
            @pl.when(flags_ref[step, p] != 0)
            def _(p=p, au_t=au_t, av=av):
                contrib = jnp.dot(au_t * scales_ref[p:p + 1, :], av,
                                  preferred_element_type=jnp.float32,
                                  precision=precision)
                out_ref[p, :, :] += contrib


def _degrid_kernel(flags_ref, iu0_ref, iv0_ref, uk_ref, vk_ref, wk_ref,
                   sub_ref, out_ref, *, support: int, num_layers: int,
                   precision):
    step = pl.program_id(0)
    num_v = uk_ref.shape[0]
    size = sub_ref.shape[-1]
    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(flags_ref[step, num_layers] != 0)
    def _():
        au = _build_band(iu0_ref[:], uk_ref, num_v, size, support)
        av = _build_band(iv0_ref[:], vk_ref, num_v, size, support)
        for layer in range(num_layers):
            @pl.when(flags_ref[step, layer] != 0)
            def _(layer=layer, au=au, av=av):
                t_re = jnp.dot(au, sub_ref[layer],
                               preferred_element_type=jnp.float32,
                               precision=precision)
                t_im = jnp.dot(au, sub_ref[num_layers + layer],
                               preferred_element_type=jnp.float32,
                               precision=precision)
                wl = wk_ref[:, layer:layer + 1]
                out_ref[:, 0:1] += wl * jnp.sum(t_re * av, axis=1,
                                                keepdims=True)
                out_ref[:, 1:2] += wl * jnp.sum(t_im * av, axis=1,
                                                keepdims=True)


def _precision(fast: bool):
    return jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST


def _pad_rows(x: Array, pad: int):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _block_flags(values: Array, num_blocks: int, block_v: int) -> Array:
    """[nb, P+1] int32: per-(block, layer) any-nonzero + block-any."""
    per_layer = jnp.any(
        values.reshape(num_blocks, block_v, values.shape[1]) != 0, axis=1)
    any_col = jnp.any(per_layer, axis=1, keepdims=True)
    return jnp.concatenate([per_layer, any_col], axis=1).astype(jnp.int32)


def _flags_spec(num_p: int):
    return pl.BlockSpec((1, num_p + 1), lambda i, *_: (i, 0),
                        memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("support", "w_support",
                                             "block_v", "fast",
                                             "interpret"))
def grid_plane_pallas(subgrids: Array, vis: Array, uv_kernel: Array,
                      w_kernel: Array, geom, support: int, w_support: int,
                      block_v: int = 2048, fast: bool = False,
                      interpret: bool = False) -> Array:
    """Pallas twin of dense_tap.grid_plane_dense (f32 compute)."""
    size = subgrids.shape[-1]
    size_pad = _round_up(size, _LANE)
    mask, iu0, iv0, u_row, v_row, w_row = geom
    v_total = mask.size
    num_p = 2 * w_support

    uk = uv_kernel[u_row.reshape(-1)].astype(jnp.float32)     # [V, S]
    vk = uv_kernel[v_row.reshape(-1)].astype(jnp.float32)
    wk = w_kernel[w_row.reshape(-1)].astype(jnp.float32)      # [V, L]
    mask_f = mask.reshape(-1)
    vis_f = vis.reshape(-1)
    vis_re = jnp.where(mask_f, vis_f.real, 0.0).astype(jnp.float32)
    vis_im = jnp.where(mask_f, vis_f.imag, 0.0).astype(jnp.float32)
    # scales[v, p]: p < L -> wk_l * re(vis); p >= L -> wk_l * im(vis)
    scales = jnp.concatenate(
        [wk * vis_re[:, None], wk * vis_im[:, None]], axis=1)  # [V, 2L]

    pad = _round_up(max(v_total, block_v), block_v) - v_total
    iu0 = _pad_rows(iu0.reshape(-1, 1), pad)
    iv0 = _pad_rows(iv0.reshape(-1, 1), pad)
    uk = _pad_rows(uk, pad)
    vk = _pad_rows(vk, pad)
    scales = _pad_rows(scales, pad)

    # Transpose the u-side operands so vis sits on lanes in the kernel.
    iu0_t = iu0.T                 # [1, V]
    uk_t = uk.T                   # [S, V]
    scales_t = scales.T           # [2L, V]

    num_blocks = iu0.shape[0] // block_v
    flags = _block_flags(scales, num_blocks, block_v)
    out = pl.pallas_call(
        functools.partial(_grid_kernel, support=support, num_p=num_p,
                          precision=_precision(fast)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
            pl.BlockSpec((1, block_v), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((support, block_v), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, support), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_p, block_v), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
            out_specs=pl.BlockSpec(
                (num_p, size_pad, size_pad), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_p, size_pad, size_pad),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(flags, iu0_t, iv0, uk_t, vk, scales_t)

    out = out[:, :size, :size]
    contrib = jax.lax.complex(out[:w_support], out[w_support:])
    return subgrids + contrib.astype(subgrids.dtype)


@functools.partial(jax.jit, static_argnames=("support", "w_support",
                                             "block_v", "fast",
                                             "interpret"))
def degrid_plane_pallas(subgrids: Array, uv_kernel: Array, w_kernel: Array,
                        geom, support: int, w_support: int,
                        block_v: int = 1024, fast: bool = False,
                        interpret: bool = False) -> Array:
    """Pallas twin of dense_tap.degrid_plane_dense (f32 compute)."""
    mask_rc = geom[0]
    shape_rc = mask_rc.shape
    size = subgrids.shape[-1]
    size_pad = _round_up(size, _LANE)
    mask, iu0, iv0, u_row, v_row, w_row = geom
    v_total = mask.size

    uk = uv_kernel[u_row.reshape(-1)].astype(jnp.float32)
    vk = uv_kernel[v_row.reshape(-1)].astype(jnp.float32)
    wk = w_kernel[w_row.reshape(-1)].astype(jnp.float32)
    # Zero masked lanes so the skip flags see true activity (outputs of
    # masked lanes are discarded anyway).
    wk = jnp.where(mask.reshape(-1)[:, None], wk,
                   jnp.zeros((), jnp.float32))
    pad = _round_up(max(v_total, block_v), block_v) - v_total
    iu0 = _pad_rows(iu0.reshape(-1, 1), pad)
    iv0 = _pad_rows(iv0.reshape(-1, 1), pad)
    uk = _pad_rows(uk, pad)
    vk = _pad_rows(vk, pad)
    wk = _pad_rows(wk, pad)

    sub = jnp.concatenate(
        [subgrids.real.astype(jnp.float32),
         subgrids.imag.astype(jnp.float32)], axis=0)
    if size_pad != size:
        sub = jnp.pad(sub, ((0, 0), (0, size_pad - size),
                            (0, size_pad - size)))

    num_blocks = iu0.shape[0] // block_v
    flags = _block_flags(wk, num_blocks, block_v)
    out = pl.pallas_call(
        functools.partial(_degrid_kernel, support=support,
                          num_layers=w_support,
                          precision=_precision(fast)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
            pl.BlockSpec((block_v, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, support), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, support), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, w_support), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w_support, size_pad, size_pad),
                         lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
            out_specs=pl.BlockSpec(
                (block_v, 2), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((iu0.shape[0], 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(flags, iu0, iv0, uk, vk, wk, sub)

    vis_f = jax.lax.complex(out[:v_total, 0], out[:v_total, 1])
    cdtype = subgrids.dtype
    vis_f = jnp.where(mask.reshape(-1), vis_f.astype(cdtype),
                      jnp.zeros((), cdtype))
    return vis_f.reshape(shape_rc)


# ---------------------------------------------------------------------------
# Fused all-layer entry points (absolute w-layer formulation)
#
# A visibility belongs to exactly one w-slab j; its tap touches absolute
# layers k = j .. j+Sw-1 with weight w_kernel[w_row, k - j]. One kernel
# invocation covers the whole tower: grid accumulates [K, N, N] layers
# (drained by ONE batched iFFT + w_pattern power ladder outside), degrid
# samples from K pre-FFT'd layers. This removes the reference's
# sequential per-plane loop (sdp_gridder_wtower_uvw.cpp:854-899,
# 1023-1100) from the device hot path entirely.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_layers", "size",
                                             "support", "block_v", "fast",
                                             "interpret"))
def grid_all_layers_pallas(vis_re, vis_im, iu0, iv0, uk, vk, weights,
                           num_layers: int, size: int, support: int,
                           block_v: int = 1024, fast: bool = False,
                           interpret: bool = False) -> Array:
    """All-layer gridding: flat taps -> [K, size, size] complex64.

    vis_re/vis_im/iu0/iv0: [V]; uk/vk: [V, S]; weights: [V, K]
    (w-kernel value of each vis for each absolute layer, zero outside
    its slab window).
    """
    size_pad = _round_up(size, _LANE)
    v_total = vis_re.shape[0]
    num_p = 2 * num_layers
    scales = jnp.concatenate([weights * vis_re[:, None],
                              weights * vis_im[:, None]], axis=1)

    pad = _round_up(max(v_total, block_v), block_v) - v_total
    iu0 = _pad_rows(iu0.reshape(-1, 1), pad)
    iv0 = _pad_rows(iv0.reshape(-1, 1), pad)
    uk = _pad_rows(uk.astype(jnp.float32), pad)
    vk = _pad_rows(vk.astype(jnp.float32), pad)
    scales = _pad_rows(scales.astype(jnp.float32), pad)

    num_blocks = iu0.shape[0] // block_v
    flags = _block_flags(scales, num_blocks, block_v)
    out = pl.pallas_call(
        functools.partial(_grid_kernel, support=support, num_p=num_p,
                          precision=_precision(fast)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
            pl.BlockSpec((1, block_v), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((support, block_v), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, support), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_p, block_v), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
            out_specs=pl.BlockSpec(
                (num_p, size_pad, size_pad), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_p, size_pad, size_pad),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(flags, iu0.T, iv0, uk.T, vk, scales.T)

    out = out[:, :size, :size]
    return jax.lax.complex(out[:num_layers], out[num_layers:])


@functools.partial(jax.jit, static_argnames=("support", "block_v", "fast",
                                             "interpret"))
def degrid_all_layers_pallas(layers: Array, iu0, iv0, uk, vk, weights,
                             support: int, block_v: int = 1024,
                             fast: bool = False,
                             interpret: bool = False) -> Array:
    """All-layer degridding: [K, N, N] complex layers -> [V] complex64."""
    num_layers, size = layers.shape[0], layers.shape[-1]
    size_pad = _round_up(size, _LANE)
    v_total = iu0.shape[0]

    pad = _round_up(max(v_total, block_v), block_v) - v_total
    iu0 = _pad_rows(iu0.reshape(-1, 1), pad)
    iv0 = _pad_rows(iv0.reshape(-1, 1), pad)
    uk = _pad_rows(uk.astype(jnp.float32), pad)
    vk = _pad_rows(vk.astype(jnp.float32), pad)
    weights = _pad_rows(weights.astype(jnp.float32), pad)

    sub = jnp.concatenate([layers.real.astype(jnp.float32),
                           layers.imag.astype(jnp.float32)], axis=0)
    if size_pad != size:
        sub = jnp.pad(sub, ((0, 0), (0, size_pad - size),
                            (0, size_pad - size)))

    num_blocks = iu0.shape[0] // block_v
    flags = _block_flags(weights, num_blocks, block_v)
    out = pl.pallas_call(
        functools.partial(_degrid_kernel, support=support,
                          num_layers=num_layers,
                          precision=_precision(fast)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
            pl.BlockSpec((block_v, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, support), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, support), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, num_layers), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * num_layers, size_pad, size_pad),
                         lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
            out_specs=pl.BlockSpec(
                (block_v, 2), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((iu0.shape[0], 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(flags, iu0, iv0, uk, vk, weights, sub)

    return jax.lax.complex(out[:v_total, 0], out[:v_total, 1])
