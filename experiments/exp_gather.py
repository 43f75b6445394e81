"""Gather/permutation micro-benchmarks for the streaming device plan.

exp_stream_stages measured _plan_chunk at 246 ms on the dense 4.2M-vis
chunk — ~10 scalar XLA gathers of ~5.9M elements each (~6 ns/elem).
This sweep measures the candidate replacements on the same scale:

  g1xN   - N separate [cap] scalar gathers from [V] sources (status quo)
  rowG8  - ONE row-gather: sources stacked [V, 8] f32, x[perm] (axis 0)
  rowG128- row-gather at [V, 128] (tests whether wider rows vectorise)
  vsort  - variadic lax.sort: 1 int32 key + 8 f32 payloads (placement
           by carrying values through the sort instead of gathering)
  sortiota - stable argsort returning order only (reference cost)

Run on the real chip: python experiments/exp_gather.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from bench import wait_for_chip  # noqa: E402

V = 4_194_304          # 4.2M sources
CAP = 5_872_128        # 1.4x padded stream

wait_for_chip()
rng = np.random.default_rng(2)
perm_h = rng.integers(0, V, CAP).astype(np.int32)
key_h = rng.integers(0, 5760, V).astype(np.int32)
xs_h = rng.standard_normal((8, V)).astype(np.float32)

perm = jnp.asarray(perm_h)
key = jnp.asarray(key_h)
xs = jnp.asarray(xs_h)
x2d8 = jnp.asarray(np.ascontiguousarray(xs_h.T))          # [V, 8]
x2d128 = jnp.asarray(
    np.ascontiguousarray(np.repeat(xs_h.T, 16, axis=1)))  # [V, 128]

red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
fbi = jax.jit(lambda p, s: jnp.clip(
    p + (s > jnp.float32(-1.0)).astype(jnp.int32), 0, V - 1))


def timeit(name, fn, feedback, state0, n=10):
    state = state0
    out = fn(state)
    _ = float(red(feedback(out)))
    for _loop in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(state)
            state = fbi(state, red(feedback(out)))
        _ = float(red(feedback(out)))
        dt = (time.perf_counter() - t0) / n
    print(f"{name:9s}: {dt * 1e3:8.2f} ms", flush=True)
    return dt


# All device arrays enter as ARGUMENTS: a jax.Array closed over by a
# jitted fn is embedded as an HLO constant and shipped to the remote
# compile endpoint (HTTP 413 above ~100 MB).
g8 = jax.jit(lambda p, xs_: sum(xs_[i].ravel()[p] for i in range(8)))
timeit("g1x8", lambda p: g8(p, xs), lambda o: o[:4096], perm)

rg8 = jax.jit(lambda p, x_: x_[p])
timeit("rowG8", lambda p: rg8(p, x2d8), lambda o: o[:4096, 0], perm)
timeit("rowG128", lambda p: rg8(p, x2d128), lambda o: o[:4096, 0], perm)

rg32 = jax.jit(lambda p, x_: x_[p])
x2d32 = jnp.asarray(np.ascontiguousarray(np.repeat(xs_h.T, 4, axis=1)))
timeit("rowG32", lambda p: rg32(p, x2d32), lambda o: o[:4096, 0], perm)

vsort = jax.jit(lambda p, key_, xs_: jax.lax.sort(
    (key_ + p[0].astype(jnp.int32),) + tuple(xs_[i] for i in range(8)),
    dimension=0, is_stable=True, num_keys=1)[1])
timeit("vsort", lambda p: vsort(p, key, xs), lambda o: o[:4096], perm)

siota = jax.jit(lambda p, key_: jnp.argsort(key_ + p[0].astype(jnp.int32),
                                            stable=True))
timeit("sortiota", lambda p: siota(p, key),
       lambda o: o[:4096].astype(jnp.float32), perm)

# -- round-3 additions: 2-D sorts, band build, tap eval ---------------

CAPV = CAP

# Column-parallel 2-D sort: key broadcast across lanes, payload rides
# as a second [V, L] operand; stable + equal keys per row => identical
# permutation per column (consistent rows).
v2d8 = jax.jit(lambda p, key_, x_: jax.lax.sort(
    (jnp.broadcast_to((key_ + p[0].astype(jnp.int32))[:, None],
                      x_.shape), x_),
    dimension=0, is_stable=True, num_keys=1)[1])
timeit("v2d8", lambda p: v2d8(p, key, x2d8), lambda o: o[:4096, 0], perm)
timeit("v2d128", lambda p: v2d8(p, key, x2d128),
       lambda o: o[:4096, 0], perm)

x2d16 = jnp.asarray(np.ascontiguousarray(np.repeat(xs_h.T, 2, axis=1)))
timeit("rowG16", lambda p: rg8(p, x2d16), lambda o: o[:4096, 0], perm)

# Unsort-by-sort: [CAP] stream sorted by original index, 2 payloads.
oidx_h = rng.permutation(CAP).astype(np.int32)
oidx = jnp.asarray(oidx_h)
cap_a = jnp.asarray(rng.standard_normal(CAP).astype(np.float32))
cap_b = jnp.asarray(rng.standard_normal(CAP).astype(np.float32))
unsort = jax.jit(lambda p, oi, a, b: jax.lax.sort(
    (oi + p[0].astype(jnp.int32), a, b),
    dimension=0, is_stable=True, num_keys=1)[1])
timeit("unsortv", lambda p: unsort(p, oidx, cap_a, cap_b),
       lambda o: o[:4096], perm)

# Band build + tap eval at stream capacity.
from ska_sdp_func_tpu.kernels.packed_tap import build_bands
from ska_sdp_func_tpu.grid_data.kernels import eval_kernel_taps
from ska_sdp_func_tpu.grid_data.wtower import _tap_coeffs_cached

uo_h = rng.integers(0, 8, CAPV).astype(np.int32)
iv_h = rng.integers(0, 120, CAPV).astype(np.int32)
uk_h = rng.standard_normal((CAPV, 8)).astype(np.float32)
uo, iv = jnp.asarray(uo_h), jnp.asarray(iv_h)
ukd = jnp.asarray(uk_h)
bands_fn = jax.jit(lambda p, uo_, iv_, uk_: build_bands(
    jnp.clip(uo_ + p[0].astype(jnp.int32) * 0, 0, 7), iv_, uk_, uk_,
    128)[1])
timeit("bands", lambda p: bands_fn(p, uo, iv, ukd),
       lambda o: o[:64, :], perm)

uv_c = _tap_coeffs_cached(8, 16 * 1024)
frac = jnp.asarray(rng.integers(0, 16 * 1024, CAPV).astype(np.int32))
taps_fn = jax.jit(lambda p, f_: eval_kernel_taps(
    jnp.clip(f_ + p[0].astype(jnp.int32) * 0, 0, 16 * 1024), uv_c,
    16 * 1024))
timeit("taps", lambda p: taps_fn(p, frac), lambda o: o[:4096, 0], perm)
