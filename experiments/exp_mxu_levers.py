"""Band kernel MXU levers: precision (fast=bf16) and block size.
Kernel+stack-only rates. One (scenario, bv, fast) per invocation to
keep HBM clean; the driver loop below runs them all via subprocess."""
import sys, time, json, os, subprocess
import numpy as np

if "--one" not in sys.argv:
    results = {}
    for tag, bv, fast in [("head", 512, 0), ("head", 1024, 0), ("head", 2048, 0),
                          ("head", 1024, 1), ("head", 2048, 1),
                          ("dense", 1024, 0), ("dense", 2048, 0),
                          ("dense", 1024, 1), ("dense", 2048, 1)]:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--one",
                            tag, str(bv), str(fast)],
                           capture_output=True, text=True, timeout=900)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            results.update(json.loads(line))
        except json.JSONDecodeError:
            results[f"{tag}_bv{bv}_{fast}"] = f"ERR {r.stderr[-200:]}"
        print(line, flush=True)
    print("ALL:", json.dumps(results))
    sys.exit(0)

import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from ska_sdp_func_tpu.parallel import plan_wstack
from ska_sdp_func_tpu.parallel.packed import plan_packed, packed_gridder
from ska_sdp_func_tpu.utility.device import device_put

tag, bv, fast = sys.argv[2], int(sys.argv[3]), bool(int(sys.argv[4]))
C_0 = 299792458.0
IMAGE, SUBGRID = 512, 128
THETA, W_STEP, HEIGHT = 0.002, 100.0, 4.0
ROWS = 16384
chans = 64 if tag == "head" else 256
rng = np.random.default_rng(1)
uvw = rng.uniform(-1, 1, (ROWS, 3))
uvw[:, :2] *= 0.45 * IMAGE / 2 / THETA
uvw[:, 2] *= 1.5 * W_STEP * HEIGHT
vis = (rng.standard_normal((ROWS, chans))
       + 1j * rng.standard_normal((ROWS, chans))).astype(np.complex64)
plan = plan_wstack(uvw, C_0, C_0/(100*chans), chans, IMAGE, SUBGRID,
                   THETA, W_STEP, support=8, w_support=4, w_tower_height=HEIGHT)
nvis = ROWS * chans
fb = jax.jit(lambda v, s: v * (jnp.float32(1.0) + jnp.float32(1e-6)*jnp.tanh(s)))
pplan = plan_packed(plan, uvw, block_v=bv)
g = packed_gridder(pplan, fast=fast)
vre0, vim = g.sort(device_put(vis))

@jax.jit
def kf(v, vim, ops, idx):
    return jnp.sum(jnp.abs(g._stage_kernel(v, vim, ops, idx)))

args = (g._grid_ops, g._grid_indices())
s = kf(vre0, vim, *args); _ = float(s)
v = vre0; dts = []
for _m in range(4):
    t0 = time.perf_counter()
    for _i in range(15):
        s = kf(v, vim, *args)
        v = fb(v, s)
    _ = float(s)
    dts.append((time.perf_counter()-t0)/15)
dt = sorted(dts[1:])[1]
key = f"{tag}_bv{bv}_{'bf16' if fast else 'f32'}"
print(json.dumps({key: round(nvis/dt/1e6, 1),
                  key + "_pad": round(pplan.total/nvis, 2)}))
