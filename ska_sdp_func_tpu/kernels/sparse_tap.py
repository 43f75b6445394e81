"""Sparse per-visibility Pallas gridding kernel (prototype).

The banded-matmul kernels (pallas_tap.py) cost ~2 N^2 w_support FLOP per
visibility — quadratic in the subgrid size N and capped by the chip's
tall-skinny matmul rate. This kernel applies each visibility's
support x support x w_support tap directly into a VMEM accumulator:
O(support * N) VPU lanes per visibility, independent of N — the CUDA
scatter's TPU twin, with the sequential grid replacing atomics.

Per visibility (inside a fori_loop over the block):
  patch[s, j] = uk[s] * vk[j - iv0]        one [S, Np] compare + outer
  out[k0+l, iu0:iu0+S, :] += patch * (wk_l * vis)   (2 w_support RMWs)

Status: prototype — validated against the dense path; the per-vis
scalar reads and dynamic-slice read-modify-writes bound throughput, see
PERFORMANCE.md for measurements and the packing plan.
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


def _sparse_grid_kernel(iu0_ref, iv0_ref, k0_ref, ukt_ref, vkt_ref,
                        scales_ref, out_ref, *, support: int,
                        w_support: int, num_k: int, block_v: int,
                        size_pad: int):
    # out_ref is [2*num_k*size_pad, size_pad]: layer k's rows start at
    # k*size_pad, so every access is one dynamic sublane slice.
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (support, size_pad), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (support, size_pad), 1)

    # Statically unrolled over the block: Mosaic (this version) crashes
    # on dynamic-offset ref accesses inside fori_loop, but compiles the
    # same access unrolled with loop-constant v.
    for v in range(block_v):
        iu0 = iu0_ref[0, v]
        iv0 = iv0_ref[0, v]
        k0 = k0_ref[0, v]
        uk_col = ukt_ref[:, v:v + 1]                # [S, 1]
        vk_col = vkt_ref[:, v:v + 1]                # [S, 1]
        # patch[s, j] = uk[s] * vk[j - iv0] — one compare places vk.
        vk_spread = jnp.where(lane_ids - row_ids == iv0, vk_col,
                              jnp.zeros((), jnp.float32))
        vk_vec = jnp.sum(vk_spread, axis=0, keepdims=True)   # [1, Np]
        patch = uk_col * vk_vec                               # [S, Np]
        base = k0 * size_pad + iu0
        for layer in range(w_support):
            s_re = scales_ref[0, v, layer]
            s_im = scales_ref[0, v, w_support + layer]
            off_re = base + layer * size_pad
            off_im = off_re + num_k * size_pad
            cur = out_ref[pl.ds(off_re, support), :]
            out_ref[pl.ds(off_re, support), :] = cur + patch * s_re
            cur_im = out_ref[pl.ds(off_im, support), :]
            out_ref[pl.ds(off_im, support), :] = cur_im + patch * s_im


@functools.partial(jax.jit, static_argnames=("num_layers", "size",
                                             "support", "w_support",
                                             "block_v", "interpret"))
def grid_all_layers_sparse(vis_re, vis_im, iu0, iv0, k0, uk, vk, wk,
                           num_layers: int, size: int, support: int,
                           w_support: int, block_v: int = 512,
                           interpret: bool = False) -> Array:
    """Sparse twin of pallas_tap.grid_all_layers_pallas.

    k0: [V] first absolute layer per vis (invalid vis: any value with
    zero wk). wk: [V, w_support] w-kernel taps (zeroed for masked vis).
    Returns [num_layers, size, size] complex64.
    """
    size_pad = _round_up(size, _LANE)
    v_total = vis_re.shape[0]
    pad = _round_up(max(v_total, block_v), block_v) - v_total

    def pad1(x, value=0):
        return jnp.pad(x, (0, pad), constant_values=value) if pad else x

    def pad2(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    iu0 = pad1(iu0).reshape(1, -1)
    iv0 = pad1(iv0).reshape(1, -1)
    # Clamp k0 so padded/out-of-window entries stay in bounds (their
    # scales are zero).
    k0 = jnp.clip(pad1(k0), 0, num_layers - w_support).reshape(1, -1)
    uk_t = pad2(uk.astype(jnp.float32)).T           # [S, V]
    vk_t = pad2(vk.astype(jnp.float32)).T
    wk = pad2(wk.astype(jnp.float32))
    scales = jnp.concatenate(
        [wk * pad1(vis_re.astype(jnp.float32))[:, None],
         wk * pad1(vis_im.astype(jnp.float32))[:, None]],
        axis=1)[None]                               # [1, V, 2*Sw]

    num_blocks = iu0.shape[1] // block_v
    out = pl.pallas_call(
        functools.partial(_sparse_grid_kernel, support=support,
                          w_support=w_support, num_k=num_layers,
                          block_v=block_v, size_pad=size_pad),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, block_v), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((support, block_v), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((support, block_v), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v, 2 * w_support),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * num_layers * size_pad, size_pad),
                               lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * num_layers * size_pad,
                                        size_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(iu0, iv0, k0, uk_t, vk_t, scales)

    out = out.reshape(2 * num_layers, size_pad, size_pad)[:, :size, :size]
    return jax.lax.complex(out[:num_layers], out[num_layers:])
