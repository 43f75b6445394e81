"""Does Mosaic overlap VPU work with MXU dots inside one kernel?

The fused tap kernels measure VPU-build + MXU-dot ~= the SUM of the
two (193.7 Mvis/s vs the band kernel's HBM-bound 397.7 at HEAD),
suggesting the units serialize.  This microbench isolates the
question with a toy kernel shaped like the fused gridder:

* ``vpu``  — per-sub-chunk synthetic tap build (3 Clenshaw evals +
  8-way one-hot band placement, the real fused-kernel VPU profile),
  result consumed by a cheap elementwise accumulate (no dot);
* ``dot``  — per-sub-chunk [128, sub] @ [sub, 128] HIGHEST dots over
  operands derived from the stream by a cast (no build);
* ``both`` — build feeds the dot (the fused kernel pattern);
* ``both2`` — build of chunk i+1 issued BEFORE the dot of chunk i is
  consumed (manual software pipelining attempt).

If t(both) ~= max(t(vpu), t(dot)) the units overlap and an
in-kernel-build kernel can reach the band kernel's rate with 16 B/vis
of HBM; if t(both) ~= t(vpu) + t(dot) they serialize and the fused
formulation is capped by the sum.

Usage: python experiments/exp_overlap.py [--one <variant>]
"""
import json
import os
import subprocess
import sys
import time
import functools

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

TOTAL = 4 * 1024 * 1024
BLOCK = 1024
SUB = 512
LANES = 128
DEG = 11
SUPPORT = 8


def measure_one(variant):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import wait_for_chip

    wait_for_chip()

    def clenshaw(x, c):
        b1 = jnp.zeros((SUPPORT,) + x.shape[-1:], jnp.float32)
        b2 = jnp.zeros_like(b1)
        for k in range(DEG, 0, -1):
            b1, b2 = c[k][:, None] + 2.0 * x * b1 - b2, b1
        return c[0][:, None] + x * b1 - b2

    def build(pa, pb, c):
        n = pa.shape[0]
        xu = pa.astype(jnp.float32) * np.float32(1e-7) - 0.5
        uk = clenshaw(xu, c)                       # [S, n]
        xv = pb.astype(jnp.float32) * np.float32(1e-7) - 0.5
        vk = clenshaw(xv, c)
        xw = (pa ^ pb).astype(jnp.float32) * np.float32(1e-7) - 0.5
        wk = clenshaw(xw, c)
        iv = (pa & 120).reshape(n, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 1)
        vb = jnp.zeros((n, LANES), jnp.float32)
        vkt = vk.T
        for s in range(SUPPORT):
            vb = jnp.where(col == iv + s, vkt[:, s:s + 1], vb)
        row = jax.lax.broadcasted_iota(jnp.int32, (16, n), 0)
        uo = pb & 7
        ub = jnp.zeros((16, n), jnp.float32)
        for s in range(SUPPORT):
            ub = jnp.where(row == uo + s, uk[s], ub)
        u_all = jnp.concatenate(
            [ub * wk[j % 4] for j in range(8)], axis=0)  # [128, n]
        return u_all, vb

    def kernel(c_ref, pa_ref, pb_ref, out_ref, *, variant):
        c = c_ref[:]
        acc = jnp.zeros((LANES, LANES), jnp.float32)
        if variant == "both2":
            # software-pipelined: build chunk i+1 before consuming
            # the dot of chunk i
            sl = pl.ds(0, SUB)
            u_all, vb = build(pa_ref[0, sl], pb_ref[0, sl], c)
            for i in range(BLOCK // SUB):
                d = jnp.dot(u_all, vb,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                if i + 1 < BLOCK // SUB:
                    sl = pl.ds((i + 1) * SUB, SUB)
                    u_all, vb = build(pa_ref[0, sl], pb_ref[0, sl], c)
                acc = acc + d
        else:
            for i in range(BLOCK // SUB):
                sl = pl.ds(i * SUB, SUB)
                pa = pa_ref[0, sl]
                pb = pb_ref[0, sl]
                if variant == "dot":
                    u_all = pa.astype(jnp.float32).reshape(
                        1, SUB) * jnp.float32(1e-9)
                    u_all = jnp.broadcast_to(u_all, (LANES, SUB))
                    vb = jnp.broadcast_to(
                        pb.astype(jnp.float32).reshape(SUB, 1)
                        * jnp.float32(1e-9), (SUB, LANES))
                    acc = acc + jnp.dot(
                        u_all, vb, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                elif variant == "vpu":
                    u_all, vb = build(pa, pb, c)
                    # consume without a dot: cheap rank-1-ish update
                    acc = acc + u_all[:, :1] * vb[:1, :]
                else:   # both
                    u_all, vb = build(pa, pb, c)
                    acc = acc + jnp.dot(
                        u_all, vb, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = acc

    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(pa, pb, c, variant):
        vec = pl.BlockSpec((1, BLOCK), lambda b: (0, b),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel, variant=variant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(TOTAL // BLOCK,),
                in_specs=[
                    pl.BlockSpec((DEG + 1, SUPPORT), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM),
                    vec, vec],
                out_specs=pl.BlockSpec((LANES, LANES),
                                       lambda b: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((LANES, LANES), jnp.float32),
        )(c, pa, pb)

    rng = np.random.default_rng(0)
    pa = jnp.asarray(rng.integers(0, 2 ** 22, (1, TOTAL), np.int32))
    pb = jnp.asarray(rng.integers(0, 2 ** 22, (1, TOTAL), np.int32))
    c = jnp.asarray(rng.standard_normal((DEG + 1, SUPPORT))
                    .astype(np.float32))
    red = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    fb = jax.jit(lambda v, s: v ^ jnp.int32(1) * (s > -1).astype(
        jnp.int32))
    out = run(pa, pb, c, variant)
    _ = float(red(out))
    for _loop in range(2):
        t0 = time.perf_counter()
        for _i in range(12):
            out = run(pa, pb, c, variant)
            pa = fb(pa, red(out))
        _ = float(red(out))
        dt = (time.perf_counter() - t0) / 12
    print("RESULT " + json.dumps(dict(
        variant=variant, t_ms=dt * 1e3,
        ns_per_vis=dt / TOTAL * 1e9)), flush=True)


def main():
    res = {}
    for variant in ("dot", "vpu", "both", "both2"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             variant],
            capture_output=True, text=True, timeout=2400)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if line is None:
            print(f"{variant}: FAILED rc {r.returncode}", flush=True)
            for ln in (r.stderr or r.stdout).strip().splitlines()[-8:]:
                print("   ", ln, flush=True)
            continue
        j = json.loads(line[len("RESULT "):])
        res[variant] = j
        print(f"{variant:6s}: {j['t_ms']:8.2f} ms "
              f"({j['ns_per_vis']:.2f} ns/vis)", flush=True)
    if "both" in res and "vpu" in res and "dot" in res:
        s = res["vpu"]["t_ms"] + res["dot"]["t_ms"]
        m = max(res["vpu"]["t_ms"], res["dot"]["t_ms"])
        print(f"sum = {s:.2f} ms, max = {m:.2f} ms, "
              f"both = {res['both']['t_ms']:.2f} ms -> "
              f"overlap fraction = "
              f"{(s - res['both']['t_ms']) / max(s - m, 1e-9):.2f}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        measure_one(sys.argv[2])
    else:
        main()
