"""Real-Mosaic compile check of the per-shard kernels on the single TPU
chip via a 1x1 mesh (ppermutes are no-ops; the pallas-in-shard_map path is
exactly the production one)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from pylamp_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from jax.sharding import Mesh
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.stokes import stokes_operator
from pylamp_tpu.parallel.halo_ops import stokes_operator_halo
from pylamp_tpu.parallel.halo_smoother import chebyshev_smooth_halo

grid = StaggeredGrid(nx=1024, ny=1024, lx=1.0, ly=1.0)
bcs = VelocityBCs()
mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
rng = np.random.default_rng(0)
f32 = jnp.float32
vx = jnp.asarray(rng.normal(size=grid.shape_vx), f32)
vy = jnp.asarray(rng.normal(size=grid.shape_vy), f32)
p = jnp.asarray(rng.normal(size=grid.shape_center), f32)
es = jnp.asarray(np.exp(2*rng.normal(size=(grid.ny+1, grid.nx+1))), f32)
en = jnp.asarray(np.exp(2*rng.normal(size=grid.shape_center)), f32)

ref = stokes_operator(vx, vy, p, es, en, grid, bcs, kcont=0.7, kbnd=1.3)

for use_pallas in (True, False):
    f = jax.jit(lambda *a: stokes_operator_halo(
        *a, grid, bcs, mesh, kcont=0.7, kbnd=1.3, use_pallas=use_pallas))
    t0 = time.time(); out = f(vx, vy, p, es, en); jax.block_until_ready(out)
    print(f"saddle halo pallas={use_pallas}: compiled {time.time()-t0:.1f}s")
    for g, r, nm in zip(out, ref, ("rx","ry","rc")):
        s = float(jnp.max(jnp.abs(r)))
        err = float(jnp.max(jnp.abs(g - r)))/s
        print(f"  {nm} rel err {err:.2e}")
        assert err < 1e-5, (nm, err)
    # timing
    ts = []
    for _ in range(20):
        t0 = time.time(); out = f(vx, vy, p, es, en); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"  median apply {np.median(ts)*1e3:.3f} ms")

# fused smoother
rx = jnp.asarray(rng.normal(size=grid.shape_vx), f32)
ry = jnp.asarray(rng.normal(size=grid.shape_vy), f32)
for iters in (3, 8):
    f = jax.jit(lambda *a, it=iters: chebyshev_smooth_halo(
        *a, grid, bcs, 1.3, jnp.asarray(3.7, f32), it, mesh,
        zero_init=False, emit_residual=True))
    t0 = time.time(); out = f(vx, vy, rx, ry, es, en); jax.block_until_ready(out)
    print(f"halo smoother iters={iters}: compiled {time.time()-t0:.1f}s")
    ts = []
    for _ in range(10):
        t0 = time.time(); out = f(vx, vy, rx, ry, es, en); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"  median sweep+residual {np.median(ts)*1e3:.3f} ms")
print("TPU shard-kernel check OK")
