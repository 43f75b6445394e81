"""Fully fused packed grid/degrid Pallas kernels (round 4).

The round-2/3 packed kernels (:mod:`.packed_tap`) stream pre-built tap
*bands* from HBM — ``ubase [16, V]`` + ``vband [V, lanes]`` + scale/w
stacks, ~600 B per visibility slot.  The round-3 block sweep proved
that operand streaming, not block latency, caps that formulation at a
block-independent floor (~10-12 ms f32 at 4.2M vis on the attached
v5e-class chip).  These kernels move the tap evaluation INSIDE the
grid/degrid kernels: each block unpacks two bit-packed int32 plan
words per slot (8 B), evaluates the Chebyshev tap fits in VMEM
(:func:`packed_tap._clenshaw_rows`, fit error ~1e-13 vs the f64
tables) and builds the band operands on the fly — the per-slot HBM
traffic drops to 16 B (grid: pa/pb/vre/vim) / 8 B (degrid: pa/pb),
and the prep stage disappears from the streaming pipeline entirely.

Packed plan words (:func:`pack_plan_words`):

* ``pa = iv0 << 20 | u_off << 17 | w_row`` — iv0 <= 2047 (subgrid up
  to 2048), u_off in [0, 8), w_row < 131072;
* ``pb = valid << 30 | u_frac << 15 | v_frac`` — fractions < 32768
  (oversampling up to 32768).

Invalid / padding slots carry ``pa = pb = 0``: the grid direction
zero-masks through the visibilities (garbage taps multiply zero), the
degrid direction through the ``valid`` bit folded into the w-taps.

Blocks are processed in ``sub_v``-slot chunks so the VPU band build
of chunk *i+1* can overlap the MXU dot of chunk *i* (Mosaic schedules
the independent chains onto the two units).

Precision modes (``precision=``):

* ``"highest"`` — f32 operands, multi-pass MXU (reference-accuracy
  path);
* ``"high"``    — MANUAL bf16 hi/lo operand split + three single-pass
  bf16 MXU dots with f32 accumulate (``a_hi@b_hi + a_hi@b_lo +
  a_lo@b_hi``; the dropped ``lo@lo`` term is ~2^-18 relative — the
  product of two ~2^-9-relative lo parts).  Mosaic's Pallas lowering
  rejects ``jax.lax.Precision.HIGH`` outright (NotImplementedError,
  measured on-chip 2026-08-20), so the split is spelled out as
  explicit dots.  Operand representation is ~16 mantissa bits
  (~1.5e-5 per-element); dot averaging lands the measured error at
  ~1.4e-6 taper-weighted image level — an order below the f32 path's
  own 2.5e-4-of-peak oracle envelope;
* ``"bf16"``    — bf16 operands, single-pass MXU (~2e-3 kernel
  accuracy; the opt-in ``fast=True`` mode).

Reference CUDA equivalent: the in-kernel oversampled-table tap lookup
of the scatter/gather kernels (sdp_gridder_wtower_uvw.cu:129-241) —
the TPU version evaluates the taps from Chebyshev fits instead of
fetching a 16k-row table, which the reference itself flags as its
memory-latency bottleneck (sdp_gridder_wtower_uvw.cpp:446-450).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_tap import WIN_ROWS, _VMEM_LIMIT, _clenshaw_rows, \
    _stack_accumulate

Array = jax.Array

# Packed-word field limits (see module docstring).
MAX_IV0 = 2047
MAX_OVERSAMPLING = 32768
MAX_W_OVERSAMPLING = 131072

_PRECISIONS = ("highest", "high", "bf16")


def _split_hi_lo(x):
    """bf16 hi/lo decomposition: ``x ~ hi + lo`` with ~16 mantissa
    bits of joint precision (each half rides a single-pass MXU dot).
    Bit-level form: see packed_tap.split_bf16 — the naive cast/sub is
    elided under excess-precision folding."""
    from .packed_tap import split_bf16
    return split_bf16(x)


def _dot_prec(a, b, precision_name: str):
    """f32 [M, K] @ [K, N] at one of the three fused precision modes
    (module docstring); always f32 accumulate/output."""
    if precision_name == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    if precision_name == "high":
        a_hi, a_lo = _split_hi_lo(a)
        b_hi, b_lo = _split_hi_lo(b)
        d = functools.partial(jnp.dot,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _dot_prec_nt(a, bt, precision_name: str):
    """``a [M, K] x bt [N, K] -> [M, N]`` (B transposed) at one of the
    three precision modes — lets the kernel build the band in the
    cheap ROW form and hand the transpose to the MXU's operand path.
    """
    dims = (((1,), (1,)), ((), ()))

    def d(x, y, prec):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    if precision_name == "bf16":
        return d(a.astype(jnp.bfloat16), bt.astype(jnp.bfloat16),
                 jax.lax.Precision.DEFAULT)
    if precision_name == "high":
        a_hi, a_lo = _split_hi_lo(a)
        b_hi, b_lo = _split_hi_lo(bt)
        p = jax.lax.Precision.DEFAULT
        return d(a_hi, b_hi, p) + (d(a_hi, b_lo, p) + d(a_lo, b_hi, p))
    return d(a, bt, jax.lax.Precision.HIGHEST)


def fused_geometry_ok(subgrid_size: int, support: int,
                      oversampling: int, w_oversampling: int) -> bool:
    """True when the plan fields fit the packed int32 words."""
    return (subgrid_size - support <= MAX_IV0
            and oversampling <= MAX_OVERSAMPLING
            and w_oversampling <= MAX_W_OVERSAMPLING)


def pack_plan_words(iv0, u_off, w_row, u_frac, v_frac, valid):
    """Bit-pack the per-slot plan fields into two int32 words.

    Works on NumPy arrays (host whole-image plan) and jnp arrays (the
    streaming device plan).  ``valid`` may be bool or {0,1} int.
    """
    xp = np if isinstance(iv0, np.ndarray) else jnp
    i32 = xp.int32
    pa = ((iv0.astype(i32) << 20) | (u_off.astype(i32) << 17)
          | w_row.astype(i32))
    pb = ((valid.astype(i32) << 30) | (u_frac.astype(i32) << 15)
          | v_frac.astype(i32))
    return pa, pb


def _unpack_words(pa, pb):
    iv0 = pa >> 20
    u_off = (pa >> 17) & 7
    w_row = pa & (MAX_W_OVERSAMPLING - 1)
    valid = pb >> 30
    u_frac = (pb >> 15) & (MAX_OVERSAMPLING - 1)
    v_frac = pb & (MAX_OVERSAMPLING - 1)
    return iv0, u_off, w_row, u_frac, v_frac, valid


def _cheb_basis(x, degree: int):
    """Chebyshev basis rows T_0..T_degree of x [n] -> [degree+1, n].

    The recurrence costs ~2 VPU ops per degree per entry on ONE
    sublane row — the per-support Clenshaw form pays the same
    recurrence broadcast over all ``support`` sublanes (~12x more
    lane-ops).  The coefficient contraction then rides the MXU.
    """
    rows = [jnp.ones_like(x), x]
    for _ in range(degree - 1):
        rows.append(2.0 * x * rows[-1] - rows[-2])
    return jnp.stack(rows[:degree + 1])


def _prep_common(pa, pb, c_uv, c_w, inv2_ov, inv2_wov, support):
    """Shared per-chunk prep: unpack + Chebyshev taps + u-base band.

    Returns (ubase [16, n], wk [Sw, n], vk [S, n], iv0, valid_f [n]).

    Tap evaluation (round-4 v2): the three Chebyshev bases (xu, xv,
    xw) stack into one [3*(deg+1), n] operand and ALL taps come from
    a single block-diagonal MXU dot ``[2S+Sw, 3*(deg+1)] @ basis`` —
    the per-support Clenshaw recurrences cost ~800 VPU lane-ops per
    entry and serialized with the main dot (measured 193.7 vs the
    band kernel's 397.7 Mvis/s dense); the basis form costs ~70.
    """
    iv0, u_off, w_row, u_frac, v_frac, valid = _unpack_words(pa, pb)
    n = pa.shape[0]
    deg = c_uv.shape[0] - 1
    s_uv = c_uv.shape[1]
    s_w = c_w.shape[1]
    xu = inv2_ov * u_frac.astype(jnp.float32) - 1.0
    xv = inv2_ov * v_frac.astype(jnp.float32) - 1.0
    xw = inv2_wov * w_row.astype(jnp.float32) - 1.0
    basis = jnp.concatenate([_cheb_basis(xu, deg),
                             _cheb_basis(xv, deg),
                             _cheb_basis(xw, deg)])  # [3*(deg+1), n]
    k = deg + 1
    # Block-diagonal coefficient matrix [2S+Sw, 3k] (built from the
    # in-VMEM coefficient tables; tiny, evaluated once per sub-chunk).
    z_uu = jnp.zeros((s_uv, k), jnp.float32)
    z_wk = jnp.zeros((s_w, k), jnp.float32)
    c_all = jnp.concatenate([
        jnp.concatenate([c_uv.T, z_uu, z_uu], axis=1),
        jnp.concatenate([z_uu, c_uv.T, z_uu], axis=1),
        jnp.concatenate([z_wk, z_wk, c_w.T], axis=1)])
    taps = jnp.dot(c_all, basis, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    uk = taps[:s_uv]                                    # [S, n]
    vk = taps[s_uv:2 * s_uv]                            # [S, n]
    wk = taps[2 * s_uv:]                                # [Sw, n]
    row16 = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, n), 0)
    ub = jnp.zeros((WIN_ROWS, n), jnp.float32)
    for s in range(support):
        ub = jnp.where(row16 == u_off + s, uk[s], ub)
    return ub, wk, vk, iv0, valid.astype(jnp.float32)


def _block_contrib(cuv_ref, cw_ref, pa_ref, pb_ref, vre_ref, vim_ref,
                   *, inv2_ov, inv2_wov, support: int, w_support: int,
                   lanes: int, sub_v: int, precision_name: str,
                   band_form: str):
    """One block's window contribution [2*w_support*16, lanes].

    Shared by the per-bucket window kernel and the per-task stack
    kernel.  band_form="row" (default): the v-band is built in the
    cheap ROW-major two-stage form and the MXU consumes it through a
    B-transposed dot_general — MEASURED 390-397 Mvis/s f32 / 422
    high / 591 bf16 on the dense 4.2M stream (2026-08-20), equal to
    the HBM-bound band kernel at 16 B/slot instead of ~600. "col"
    (the original form, 163.5 Mvis/s) is kept for comparison only.
    """
    num_p = 2 * w_support
    block_v = pa_ref.shape[1]
    c_uv, c_w = cuv_ref[:], cw_ref[:]
    contrib = jnp.zeros((num_p * WIN_ROWS, lanes), jnp.float32)
    for i in range(block_v // sub_v):
        sl = pl.ds(i * sub_v, sub_v)
        pa = pa_ref[0, sl]
        pb = pb_ref[0, sl]
        ub, wk, vk, iv0, _valid = _prep_common(
            pa, pb, c_uv, c_w, inv2_ov, inv2_wov, support)
        vre = vre_ref[0, sl]
        vim = vim_ref[0, sl]
        # u_all rows j*16+r: (re if j < Sw else im) scale of layer
        # j % Sw times the placed u-taps (packed_tap row layout).
        u_all = jnp.concatenate(
            [ub * (wk[j] * vre)[None, :] for j in range(w_support)]
            + [ub * (wk[j] * vim)[None, :]
               for j in range(w_support)],
            axis=0)                                 # [num_p*16, n]
        if band_form == "row":
            # Row-form band (cheap two-stage placement) + a
            # B-transposed MXU contraction.
            vbt = _place_vband_t(vk, iv0, sub_v, lanes, support)
            contrib = contrib + _dot_prec_nt(u_all, vbt,
                                             precision_name)
        else:
            vb = _place_vband(vk, iv0, sub_v, lanes, support)
            contrib = contrib + _dot_prec(u_all, vb,
                                          precision_name)
    return contrib


def _grid_fused_kernel(bucket_ref, nonempty_ref, cuv_ref, cw_ref,
                       pa_ref, pb_ref, vre_ref, vim_ref, out_ref, *,
                       inv2_ov, inv2_wov, support: int, w_support: int,
                       lanes: int, sub_v: int, precision_name: str,
                       band_form: str = "row"):
    b = pl.program_id(0)
    prev = bucket_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != bucket_ref[b])
    num_p = 2 * w_support
    occupied = nonempty_ref[b] != 0

    @pl.when(occupied)
    def _():
        contrib = _block_contrib(
            cuv_ref, cw_ref, pa_ref, pb_ref, vre_ref, vim_ref,
            inv2_ov=inv2_ov, inv2_wov=inv2_wov, support=support,
            w_support=w_support, lanes=lanes, sub_v=sub_v,
            precision_name=precision_name, band_form=band_form)
        contrib = contrib.reshape(num_p, WIN_ROWS, lanes)

        @pl.when(first)
        def _():
            out_ref[:, 0] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:, 0] += contrib

    # Empty (capacity-filler) blocks skip the build + dot entirely —
    # the streaming plan's cap padding (~1.4x slots) otherwise pays
    # full kernel cost for all-zero blocks. Zero-init on first so the
    # window is never garbage for a bucket whose only blocks are
    # empty (can only be the clipped filler bucket; folds mask it).
    @pl.when(jnp.logical_not(occupied) & first)
    def _():
        out_ref[:, 0] = jnp.zeros_like(out_ref[:, 0])


def _place_vband(vk, iv0, n: int, lanes: int, support: int):
    """Place v-taps vk [S, n] at lane offsets iv0 -> [n, lanes].

    Direct 8-way one-hot over the full lane width.  MEASURED NEGATIVE
    RESULT (2026-08-20 on-chip): a "two-stage" variant (16-lane
    window then octet expansion) halved the grid_fused rate (193.7 ->
    ~100 Mvis/s) — narrow [n, 16] arrays occupy full 128-lane vregs,
    so the "cheaper" stage A costs the same per op as full-width
    selects, and the 8-lane-slice concats lower to expensive lane
    shuffles.  The row-major twin (:func:`_place_vband_t`) keeps the
    two-stage form: there the narrow stage runs on [16, n] (full lane
    utilisation) and the tiles concat along SUBLANES (row copies).
    """
    vkt = vk.T                                          # [n, S]
    iv = iv0.reshape(n, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 1)
    vb = jnp.zeros((n, lanes), jnp.float32)
    for s in range(support):
        vb = jnp.where(col == iv + s, vkt[:, s:s + 1], vb)
    return vb


@functools.partial(jax.jit, static_argnames=(
    "num_buckets", "lanes", "support", "w_support", "oversampling",
    "w_oversampling", "block_v", "sub_v", "precision", "band_form",
    "interpret"))
def grid_fused_pallas(bucket_ids, pa, pb, vre, vim, uv_coeffs,
                      w_coeffs, num_buckets: int, lanes: int,
                      support: int, w_support: int, oversampling: int,
                      w_oversampling: int, block_v: int = 1024,
                      sub_v: int = 0, precision: str = "highest",
                      nonempty=None, band_form: str = "row",
                      interpret: bool = False) -> Array:
    """Fused packed gridding: bit-packed plan words -> window stack.

    pa/pb: [total] int32 (:func:`pack_plan_words`, bucket-sorted and
    block-padded); vre/vim: [total] f32 (zero on invalid/padding
    slots); bucket_ids: [total // block_v] int32.  ``nonempty``
    ([num_blocks] int32, optional): blocks marked 0 skip the tap
    build and dot entirely — the streaming plan passes its per-block
    valid counts so capacity-filler blocks (cap ~1.4x the chunk) cost
    nothing.  Returns [2*w_support, num_buckets, 16, lanes] f32
    windows in the :mod:`.packed_tap` row layout (garbage in
    never-visited buckets — mask the fold with the plan's visited
    mask).
    """
    total = pa.shape[0]
    num_blocks = total // block_v
    num_p = 2 * w_support
    if not sub_v:
        sub_v = min(block_v, 512)
    c_uv = jnp.asarray(uv_coeffs, jnp.float32)
    c_w = jnp.asarray(w_coeffs, jnp.float32)
    if nonempty is None:
        nonempty = jnp.ones((num_blocks,), jnp.int32)
    # Streams are presented [1, total] and blocked along the LAST dim:
    # Mosaic requires the block's last two dims to divide (8, 128) or
    # equal the array dims — (1, block_v) over [1, total] satisfies
    # both; the (num_blocks, block_v) form does not (block dim -2 of 1
    # neither divides 8 nor equals num_blocks).
    vec = pl.BlockSpec((1, block_v), lambda b, ids, ne: (0, b),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _grid_fused_kernel,
            inv2_ov=np.float32(2.0 / oversampling),
            inv2_wov=np.float32(2.0 / w_oversampling),
            support=support, w_support=w_support, lanes=lanes,
            sub_v=sub_v, precision_name=precision,
            band_form=band_form),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(c_uv.shape, lambda b, ids, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(c_w.shape, lambda b, ids, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                vec, vec, vec, vec,
            ],
            out_specs=pl.BlockSpec(
                (num_p, 1, WIN_ROWS, lanes),
                lambda b, ids, ne: (0, ids[b], 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_p, num_buckets, WIN_ROWS, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bucket_ids, nonempty, c_uv, c_w, pa.reshape(1, total),
      pb.reshape(1, total), vre.reshape(1, total),
      vim.reshape(1, total))


def _grid_stack_kernel(t_ref, k_ref, g_ref, nonempty_ref, cuv_ref,
                       cw_ref, pa_ref, pb_ref, vre_ref, vim_ref,
                       out_ref, *, inv2_ov, inv2_wov, support: int,
                       w_support: int, lanes: int, sub_v: int,
                       sub_pad: int, precision_name: str,
                       band_form: str = "row"):
    b = pl.program_id(0)
    prev = t_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != t_ref[b])

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(nonempty_ref[b] != 0)
    def _():
        contrib = _block_contrib(
            cuv_ref, cw_ref, pa_ref, pb_ref, vre_ref, vim_ref,
            inv2_ov=inv2_ov, inv2_wov=inv2_wov, support=support,
            w_support=w_support, lanes=lanes, sub_v=sub_v,
            precision_name=precision_name, band_form=band_form)
        _stack_accumulate(out_ref, contrib, k_ref[b], g_ref[b] * 8,
                          w_support, sub_pad)


@functools.partial(jax.jit, static_argnames=(
    "num_tasks", "num_layers", "lanes", "support", "w_support",
    "oversampling", "w_oversampling", "block_v", "sub_v", "precision",
    "band_form", "interpret"))
def grid_fused_stack_pallas(t_idx, k_idx, g_idx, pa, pb, vre, vim,
                            uv_coeffs, w_coeffs, num_tasks: int,
                            num_layers: int, lanes: int, support: int,
                            w_support: int, oversampling: int,
                            w_oversampling: int, block_v: int = 1024,
                            sub_v: int = 0, precision: str = "highest",
                            nonempty=None, band_form: str = "row",
                            interpret: bool = False) -> Array:
    """Fused gridding v3: accumulate whole per-TASK tower stacks in
    VMEM instead of per-bucket 16-row windows in HBM.

    The per-bucket window formulation writes ``num_buckets`` x 64 KB
    of windows that a separate fold pass then re-reads — on the
    1M-vis whole-image scenario that is ~250 MB written + read per
    call (~240 B/vis of pure window traffic), the dominant fixed cost
    of the headline driver (BENCH_r04: whole-image at 0.48x its own
    dense kernel rate).  Here each block's [2*w_support*16, lanes]
    contribution is accumulated straight into a resident
    ``[2, num_layers*(lanes+8), lanes]`` VMEM buffer holding the
    task's full tower stack (re/im planes, u rows padded by 8 for the
    last octet's overhang), flushed ONCE per task — the window HBM
    traffic drops to ``num_tasks * 2 * num_layers * (lanes+8) * lanes
    * 4`` bytes (~4.5x less on the headline) and the fold pass
    disappears.

    Requires blocks sorted task-major (the packed plan's bucket order
    ``(task, slab, octet)`` guarantees it).  t_idx/k_idx/g_idx: [NB]
    int32 per-block task / w-slab / u-octet.  Returns
    ``[num_tasks, 2, num_layers*(lanes+8), lanes]`` f32; rows
    ``[lanes:lanes+8)`` of each layer are always zero (taps end at
    u = lanes).  Reference role: the per-subgrid accumulation of
    sdp_gridder_wtower_uvw.cu:240-241, with the task's whole tower
    resident on-core instead of atomicAdd'd in HBM.
    """
    total = pa.shape[0]
    num_blocks = total // block_v
    sub_pad = lanes + 8
    if not sub_v:
        sub_v = min(block_v, 512)
    c_uv = jnp.asarray(uv_coeffs, jnp.float32)
    c_w = jnp.asarray(w_coeffs, jnp.float32)
    if nonempty is None:
        nonempty = jnp.ones((num_blocks,), jnp.int32)
    vec = pl.BlockSpec((1, block_v), lambda b, t, k, g, ne: (0, b),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _grid_stack_kernel,
            inv2_ov=np.float32(2.0 / oversampling),
            inv2_wov=np.float32(2.0 / w_oversampling),
            support=support, w_support=w_support, lanes=lanes,
            sub_v=sub_v, sub_pad=sub_pad, precision_name=precision,
            band_form=band_form),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(c_uv.shape,
                             lambda b, t, k, g, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(c_w.shape,
                             lambda b, t, k, g, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                vec, vec, vec, vec,
            ],
            out_specs=pl.BlockSpec(
                (1, 2, num_layers * sub_pad, lanes),
                lambda b, t, k, g, ne: (t[b], 0, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_tasks, 2, num_layers * sub_pad, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(t_idx, k_idx, g_idx, nonempty, c_uv, c_w,
      pa.reshape(1, total), pb.reshape(1, total),
      vre.reshape(1, total), vim.reshape(1, total))


def _grid_compact_kernel(t_ref, k_ref, g_ref, pa_ref, ukt_ref,
                         vkt_ref, wkt_ref, vre_ref, vim_ref, out_ref,
                         *, support: int, w_support: int, lanes: int,
                         sub_v: int, sub_pad: int,
                         precision_name: str):
    """Compact-stream grid kernel: pre-evaluated taps streamed
    (uk/vk [S, n] + wk [Sw, n] f32, 80 B/slot with pa + vis vs the
    band form's 600), u/v-band PLACEMENT done in VMEM (the cheap part
    of the fused build — no Chebyshev evaluation, which is what
    serializes the fused kernel against the MXU)."""
    b = pl.program_id(0)
    prev = t_ref[jnp.maximum(b - 1, 0)]
    first = jnp.logical_or(b == 0, prev != t_ref[b])

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    num_p = 2 * w_support
    block_v = pa_ref.shape[1]
    contrib = jnp.zeros((num_p * WIN_ROWS, lanes), jnp.float32)
    for i in range(block_v // sub_v):
        sl = pl.ds(i * sub_v, sub_v)
        pa = pa_ref[0, sl]
        iv0 = pa >> 20
        u_off = (pa >> 17) & 7
        uk = ukt_ref[:, sl]
        vk = vkt_ref[:, sl]
        wk = wkt_ref[:, sl]
        vre = vre_ref[0, sl]
        vim = vim_ref[0, sl]
        row16 = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, sub_v),
                                         0)
        ub = jnp.zeros((WIN_ROWS, sub_v), jnp.float32)
        for s in range(support):
            ub = jnp.where(row16 == u_off + s, uk[s], ub)
        u_all = jnp.concatenate(
            [ub * (wk[j] * vre)[None, :] for j in range(w_support)]
            + [ub * (wk[j] * vim)[None, :] for j in range(w_support)],
            axis=0)
        vbt = _place_vband_t(vk, iv0, sub_v, lanes, support)
        contrib = contrib + _dot_prec_nt(u_all, vbt, precision_name)
    _stack_accumulate(out_ref, contrib, k_ref[b], g_ref[b] * 8,
                      w_support, sub_pad)


@functools.partial(jax.jit, static_argnames=(
    "num_tasks", "num_layers", "lanes", "support", "w_support",
    "block_v", "sub_v", "precision", "interpret"))
def grid_compact_pallas(t_idx, k_idx, g_idx, pa, uk_t, vk_t, wk_t,
                        vre, vim, num_tasks: int, num_layers: int,
                        lanes: int, support: int, w_support: int,
                        block_v: int = 1024, sub_v: int = 0,
                        precision: str = "highest",
                        interpret: bool = False) -> Array:
    """Compact-stream packed gridding with per-task stack output.

    Streams per slot: pa (4 B, iv0/u_off) + uk/vk [support, V]
    (64 B) + wk [w_support, V] (16 B) + vre/vim (8 B) = 92 B vs the
    band form's 600 — the headline scenario's band kernel is
    stream-DMA-bound (measured 2.8 ns/slot of which ~2.2 is the 600
    B/slot stream at ~280 GB/s).  Taps are pre-evaluated on device at
    plan attach (same tables as the band build, placement skipped);
    the kernel only PLACES them at their sublane/lane offsets — the
    cheap half of the fused build (the Chebyshev evaluation is what
    serializes against the MXU, exp_overlap.py).
    Returns the same [T, 2, K*(lanes+8), lanes] stack as
    :func:`grid_fused_stack_pallas`.
    """
    total = pa.shape[0]
    num_blocks = total // block_v
    sub_pad = lanes + 8
    if not sub_v:
        sub_v = min(block_v, 512)
    vec = pl.BlockSpec((1, block_v), lambda b, t, k, g: (0, b),
                       memory_space=pltpu.VMEM)

    def tap(rows):
        return pl.BlockSpec((rows, block_v), lambda b, t, k, g: (0, b),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _grid_compact_kernel, support=support,
            w_support=w_support, lanes=lanes, sub_v=sub_v,
            sub_pad=sub_pad, precision_name=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_blocks,),
            in_specs=[vec, tap(support), tap(support),
                      tap(w_support), vec, vec],
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
    )(t_idx, k_idx, g_idx, pa.reshape(1, total), uk_t, vk_t, wk_t,
      vre.reshape(1, total), vim.reshape(1, total))


def _degrid_compact_kernel(t_ref, k_ref, g_ref, pa_ref, ukt_ref,
                           vkt_ref, wkt_ref, ts_ref, out_ref, *,
                           support: int, w_support: int, lanes: int,
                           sub_pad: int, precision):
    from .packed_tap import _degrid_math, _window_from_stack

    b = pl.program_id(0)
    win = _window_from_stack(ts_ref, k_ref[b], g_ref[b] * 8,
                             w_support, sub_pad)
    pa = pa_ref[0, :]
    iv0 = pa >> 20
    u_off = (pa >> 17) & 7
    n = pa.shape[0]
    uk = ukt_ref[:]
    row16 = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, n), 0)
    ub = jnp.zeros((WIN_ROWS, n), jnp.float32)
    for s in range(support):
        ub = jnp.where(row16 == u_off + s, uk[s], ub)
    vbt = _place_vband_t(vkt_ref[:], iv0, n, lanes, support)
    _degrid_math(win, ub, vbt, wkt_ref[:], out_ref, w_support,
                 precision)


@functools.partial(jax.jit, static_argnames=(
    "support", "w_support", "block_v", "fast", "interpret", "raw"))
def degrid_compact_pallas(stack: Array, t_idx, k_idx, g_idx, pa, uk_t,
                          vk_t, wk_t, support: int, w_support: int,
                          block_v: int = 512, fast: bool = False,
                          interpret: bool = False,
                          raw: bool = False) -> Array:
    """Compact-stream degridding from per-task tower stacks.

    Streams per slot: pa (4 B) + uk/vk [support, V] (64 B) + wk
    [w_support, V] (16 B) = 84 B vs the band form's 592 — the degrid
    band kernel measured AT its multi-stream DMA bound (2.95 ms vs a
    2.4 ms byte floor on the 1M-vis headline), so bytes are time
    there, and the in-kernel PLACEMENT (no Chebyshev — the expensive
    half of the fused build) adds only VPU selects. ``wk_t`` must be
    pre-zeroed on invalid/padding slots (the plan arrays carry
    ``wk * valid``). Returns [V] complex64 in sorted order.
    """
    total = pa.shape[0]
    num_blocks = total // block_v
    lanes = stack.shape[3]
    ksp = stack.shape[2]
    sub_pad = lanes + 8

    def tap(rows):
        return pl.BlockSpec((rows, block_v), lambda b, t, k, g: (0, b),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _degrid_compact_kernel, support=support,
            w_support=w_support, lanes=lanes, sub_pad=sub_pad,
            precision=(jax.lax.Precision.DEFAULT if fast
                       else jax.lax.Precision.HIGHEST)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((1, block_v), lambda b, t, k, g: (0, b),
                             memory_space=pltpu.VMEM),
                tap(support), tap(support), tap(w_support),
                pl.BlockSpec((1, 2, ksp, lanes),
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
    )(t_idx, k_idx, g_idx, pa.reshape(1, total), uk_t, vk_t, wk_t,
      stack)
    if raw:
        return out
    return jax.lax.complex(out[0], out[1])


def _place_vband_t(vk, iv0, n: int, lanes: int, support: int):
    """Row-major twin of :func:`_place_vband`: vk [S, n] placed at
    sublane offsets iv0 -> [lanes, n] (vis on lanes)."""
    r = (iv0 & 7)[None, :]
    q = (iv0 >> 3)[None, :]
    row16 = jax.lax.broadcasted_iota(jnp.int32, (16, n), 0)
    vk16 = jnp.zeros((16, n), jnp.float32)
    for s in range(support):
        vk16 = jnp.where(row16 == r + s, vk[s], vk16)
    nq = lanes // 8
    ve_lo = jnp.concatenate([vk16[:8]] * nq, axis=0)
    ve_hi = jnp.concatenate([vk16[8:]] * nq, axis=0)
    rowq = jax.lax.broadcasted_iota(jnp.int32, (lanes, n), 0) >> 3
    return (jnp.where(rowq == q, ve_lo, 0.0)
            + jnp.where(rowq == q + 1, ve_hi, 0.0))


def _degrid_fused_kernel(p_ref, g_ref, hv_ref, nonempty_ref, cuv_ref,
                         cw_ref, pa_ref, pb_ref, *rest, inv2_ov,
                         inv2_wov, support: int, w_support: int,
                         n_vq: int, sub_v: int, precision_name: str):
    quads = rest[:-1]
    out_ref = rest[-1]
    b = pl.program_id(0)
    occupied = nonempty_ref[b] != 0

    @pl.when(jnp.logical_not(occupied))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref[:])

    @pl.when(occupied)
    def _():
        _degrid_fused_body(
            quads, out_ref, cuv_ref, cw_ref, pa_ref, pb_ref,
            inv2_ov=inv2_ov, inv2_wov=inv2_wov, support=support,
            w_support=w_support, n_vq=n_vq, sub_v=sub_v,
            precision_name=precision_name)


def _degrid_fused_body(quads, out_ref, cuv_ref, cw_ref, pa_ref,
                       pb_ref, *, inv2_ov, inv2_wov, support: int,
                       w_support: int, n_vq: int, sub_v: int,
                       precision_name: str):
    # Window assembly from the aligned (8-row, 128-lane) quadrant
    # tiles (identical to packed_tap._degrid_fused_kernel; consecutive
    # blocks of the same bucket re-use the resident tiles).
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
    _degrid_fused_core(win, out_ref, cuv_ref, cw_ref, pa_ref, pb_ref,
                       inv2_ov=inv2_ov, inv2_wov=inv2_wov,
                       support=support, w_support=w_support,
                       lanes=n_vq * 128, sub_v=sub_v,
                       precision_name=precision_name)


def _degrid_fused_core(win, out_ref, cuv_ref, cw_ref, pa_ref,
                       pb_ref, *, inv2_ov, inv2_wov, support: int,
                       w_support: int, lanes: int, sub_v: int,
                       precision_name: str):
    c_uv, c_w = cuv_ref[:], cw_ref[:]
    block_v = pa_ref.shape[1]
    bf16 = precision_name == "bf16"
    half = w_support * WIN_ROWS
    # Hoist the window's (bf16 / hi-lo split) form out of the sub-chunk
    # loop — the resident tiles are shared by every sub-chunk.
    if precision_name == "high":
        win_hi, win_lo = _split_hi_lo(win)
    elif bf16:
        win_b = win.astype(jnp.bfloat16)

    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * half), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * half), 1)
    sel = jnp.where((rows == 0) & (cols < half), 1.0,
                    jnp.where((rows == 1) & (cols >= half), 1.0, 0.0)
                    ).astype(jnp.float32)

    for i in range(block_v // sub_v):
        sl = pl.ds(i * sub_v, sub_v)
        pa = pa_ref[0, sl]
        pb = pb_ref[0, sl]
        ub, wk, vk, iv0, valid_f = _prep_common(
            pa, pb, c_uv, c_w, inv2_ov, inv2_wov, support)
        wkv = wk * valid_f                              # [Sw, n]
        # v-band transposed (lanes on sublanes, vis on lanes) so the
        # big contraction is a standard untransposed MXU matmul.
        vbt = _place_vband_t(vk, iv0, sub_v, lanes, support)
        d = functools.partial(jnp.dot,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        if precision_name == "high":
            v_hi, v_lo = _split_hi_lo(vbt)
            t_T = (d(win_hi, v_hi)
                   + (d(win_hi, v_lo) + d(win_lo, v_hi)))
        elif bf16:
            t_T = d(win_b, vbt.astype(jnp.bfloat16))
        else:
            t_T = jnp.dot(win, vbt,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        # t_T: [2*half, n]
        uwh = jnp.concatenate(
            [ub * wkv[layer:layer + 1, :]
             for layer in range(w_support)], axis=0)    # [half, n]
        prod = jnp.concatenate([uwh, uwh], axis=0) * t_T
        out_ref[:, sl] = jnp.dot(sel, prod,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=(
    "lanes", "support", "w_support", "oversampling", "w_oversampling",
    "block_v", "sub_v", "precision", "interpret", "raw"))
def degrid_fused2_pallas(planes: Array, p_idx, g_idx, hv_idx, pa, pb,
                         uv_coeffs, w_coeffs, lanes: int, support: int,
                         w_support: int, oversampling: int,
                         w_oversampling: int, block_v: int = 1024,
                         sub_v: int = 0, precision: str = "highest",
                         nonempty=None,
                         interpret: bool = False,
                         raw: bool = False) -> Array:
    """Fused degridding with in-kernel tap evaluation.

    planes: [2, P, rows_pad, lanes_pad] f32 padded plane stack (as in
    :func:`packed_tap.degrid_fused_pallas`); p_idx/g_idx/hv_idx: [NB]
    int32 per-block window-tile coordinates; pa/pb: [total] int32
    packed plan words (``valid`` bit zero on padding slots);
    ``nonempty``: optional [NB] int32 — 0-marked (capacity-filler)
    blocks skip the build + dots and write zeros; ``lanes`` is the
    window lane width (the subgrid size for w-towers).
    Returns [total] complex64 in sorted order (or the raw [8, total]
    f32 pair with ``raw=True``).
    """
    total = pa.shape[0]
    num_blocks = total // block_v
    n_vq = lanes // 128
    if not sub_v:
        sub_v = min(block_v, 512)
    c_uv = jnp.asarray(uv_coeffs, jnp.float32)
    c_w = jnp.asarray(w_coeffs, jnp.float32)
    if nonempty is None:
        nonempty = jnp.ones((num_blocks,), jnp.int32)

    quad_specs = []
    for layer in range(w_support):
        for dg in (0, 1):
            for dv in range(n_vq):
                quad_specs.append(pl.BlockSpec(
                    (2, 1, 8, 128),
                    functools.partial(
                        lambda b, p, g, hv, ne, L=0, DG=0, DV=0:
                        (0, p[b] + L, g[b] + DG, hv[b] + DV),
                        L=layer, DG=dg, DV=dv),
                    memory_space=pltpu.VMEM))

    # [1, total] streams blocked along the last dim (see
    # grid_fused_pallas: the (num_blocks, block_v) form fails the
    # Mosaic block-shape rule).
    vec = pl.BlockSpec((1, block_v), lambda b, p, g, hv, ne: (0, b),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _degrid_fused_kernel,
            inv2_ov=np.float32(2.0 / oversampling),
            inv2_wov=np.float32(2.0 / w_oversampling),
            support=support, w_support=w_support, n_vq=n_vq,
            sub_v=sub_v, precision_name=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(c_uv.shape,
                             lambda b, p, g, hv, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(c_w.shape,
                             lambda b, p, g, hv, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                vec, vec,
            ] + quad_specs,
            out_specs=pl.BlockSpec((8, block_v),
                                   lambda b, p, g, hv, ne: (0, b),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(p_idx, g_idx, hv_idx, nonempty, c_uv, c_w,
      pa.reshape(1, total), pb.reshape(1, total),
      *([planes] * (2 * n_vq * w_support)))
    if raw:
        return out
    return jax.lax.complex(out[0], out[1])


def _degrid_fstack_kernel(t_ref, k_ref, g_ref, nonempty_ref, cuv_ref,
                          cw_ref, pa_ref, pb_ref, ts_ref, out_ref, *,
                          inv2_ov, inv2_wov, support: int,
                          w_support: int, lanes: int, sub_pad: int,
                          sub_v: int, precision_name: str):
    from .packed_tap import _window_from_stack

    b = pl.program_id(0)
    occupied = nonempty_ref[b] != 0

    @pl.when(jnp.logical_not(occupied))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref[:])

    @pl.when(occupied)
    def _():
        win = _window_from_stack(ts_ref, k_ref[b], g_ref[b] * 8,
                                 w_support, sub_pad)
        _degrid_fused_core(win, out_ref, cuv_ref, cw_ref, pa_ref,
                           pb_ref, inv2_ov=inv2_ov, inv2_wov=inv2_wov,
                           support=support, w_support=w_support,
                           lanes=lanes, sub_v=sub_v,
                           precision_name=precision_name)


@functools.partial(jax.jit, static_argnames=(
    "lanes", "support", "w_support", "oversampling", "w_oversampling",
    "block_v", "sub_v", "precision", "interpret", "raw"))
def degrid_fused2_stack_pallas(stack: Array, t_idx, k_idx, g_idx, pa,
                               pb, uv_coeffs, w_coeffs, lanes: int,
                               support: int, w_support: int,
                               oversampling: int, w_oversampling: int,
                               block_v: int = 1024, sub_v: int = 0,
                               precision: str = "highest",
                               nonempty=None, interpret: bool = False,
                               raw: bool = False) -> Array:
    """Fused degridding from per-TASK tower stacks (v3 input form of
    :func:`degrid_fused2_pallas` — see
    :func:`packed_tap.degrid_stack_pallas` for the byte argument).

    ``stack``: [T, 2, num_layers*(lanes+8), lanes] f32 task-major
    layer stacks; windows are sliced from the task's resident block
    in VMEM instead of per-bucket (8, 128)-tile DMAs.
    """
    total = pa.shape[0]
    num_blocks = total // block_v
    sub_pad = lanes + 8
    ksp = stack.shape[2]
    if not sub_v:
        sub_v = min(block_v, 512)
    c_uv = jnp.asarray(uv_coeffs, jnp.float32)
    c_w = jnp.asarray(w_coeffs, jnp.float32)
    if nonempty is None:
        nonempty = jnp.ones((num_blocks,), jnp.int32)
    vec = pl.BlockSpec((1, block_v), lambda b, t, k, g, ne: (0, b),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _degrid_fstack_kernel,
            inv2_ov=np.float32(2.0 / oversampling),
            inv2_wov=np.float32(2.0 / w_oversampling),
            support=support, w_support=w_support, lanes=lanes,
            sub_pad=sub_pad, sub_v=sub_v, precision_name=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(c_uv.shape,
                             lambda b, t, k, g, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(c_w.shape,
                             lambda b, t, k, g, ne: (0, 0),
                             memory_space=pltpu.VMEM),
                vec, vec,
                pl.BlockSpec((1, 2, ksp, lanes),
                             lambda b, t, k, g, ne: (t[b], 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block_v),
                                   lambda b, t, k, g, ne: (0, b),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(t_idx, k_idx, g_idx, nonempty, c_uv, c_w,
      pa.reshape(1, total), pb.reshape(1, total), stack)
    if raw:
        return out
    return jax.lax.complex(out[0], out[1])
