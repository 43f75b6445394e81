import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")

m0 = jnp.ones((512, 512), jnp.float32)

def timeloop(name, fn, K):
    s = fn(m0); _ = float(s)
    for _m in range(3):
        t0 = time.perf_counter()
        s = fn(m0)
        _ = float(s)
        dt = (time.perf_counter()-t0)
    print(f"{name}: total {dt*1e3:.2f} ms ({dt/K*1e3:.3f} ms/iter)", flush=True)

def body(m):
    return m + jnp.float32(1e-6) * jnp.tanh(jnp.sum(m[:8, :8]))

for K in (15, 50):
    timeloop(f"fori K={K}", jax.jit(
        lambda m, K=K: jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, m: body(m), m)[:8, :8])), K)
    timeloop(f"while K={K}", jax.jit(
        lambda m, K=K: jnp.sum(jax.lax.while_loop(
            lambda c: c[0] < K,
            lambda c: (c[0] + 1, body(c[1])), (0, m))[1][:8, :8])), K)
    timeloop(f"unrolled K={K}", jax.jit(
        lambda m, K=K: jnp.sum(
            (lambda mm: [mm := body(mm) for _ in range(K)][-1])(m)[:8, :8])), K)
    timeloop(f"scan K={K}", jax.jit(
        lambda m, K=K: jnp.sum(jax.lax.scan(
            lambda mm, _: (body(mm), None), m, None, length=K)[0][:8, :8])), K)
