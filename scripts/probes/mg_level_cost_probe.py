"""Per-depth cost of the MG preconditioner application at 1024^2 (bench
tuning): time M(r) for hierarchies truncated at `levels` = 3..full.  The
increments isolate what the coarse (dispatch-bound) levels cost per
application, i.e. the prize of a fused coarse-V-cycle kernel."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import time

import jax

jax.config.update("jax_enable_x64", True)
from pylamp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.solvers.mg import make_mg_preconditioner
from pylamp_tpu.solvers.scaling import characteristic_viscosity, stokes_scales

nx = ny = 1024
grid = StaggeredGrid(nx, ny, 1.0, 1.0)
bcs = VelocityBCs()
rng = np.random.default_rng(0)
f32 = jnp.float32

eta_n = jnp.asarray(10.0 ** (4.0 * rng.random((ny, nx))), f32)
eta_s = jnp.asarray(10.0 ** (4.0 * rng.random((ny + 1, nx + 1))), f32)
eta_char = characteristic_viscosity(eta_n.astype(jnp.float64))
kcont, kbnd = stokes_scales(eta_char, grid)
kcont32, kbnd32 = kcont.astype(f32), kbnd.astype(f32)

r = (jnp.asarray(rng.standard_normal(grid.shape_vx), f32),
     jnp.asarray(rng.standard_normal(grid.shape_vy), f32),
     jnp.asarray(rng.standard_normal(grid.shape_center), f32))


def timeit(f, *args, n=30):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


prev = None
for lv in [3, 4, 5, 6, 7, 8, 0]:
    M = make_mg_preconditioner(
        eta_s, eta_n, grid, kcont32, kbnd32, bcs=bcs,
        levels=lv, cycles=2, pre_smooth=4, post_smooth=4)
    t = timeit(jax.jit(M), r)
    d = "" if prev is None else f"  (+{(t - prev) * 1e3:.3f} ms)"
    print(f"levels={lv or 'full'}: {t * 1e3:.3f} ms/apply{d}", flush=True)
    prev = t
