"""Equilibrated Braess-Sarazin coupled MG (solvers/vanka.py,
SolverConfig.preconditioner="vanka") at sticky-air-class sharp viscosity
contrast — the round-3 verdict flagged the module as untested shipping
code ('test it or delete it').

The test solves a cell-sharp 1e6-contrast two-layer Stokes problem with
both extreme-contrast preconditioners and pins (a) that the vanka path
CONVERGES to 1e-8 where the plain one-V-cycle diag-Schur preconditioner
is known to need ~1e3 iterations, and (b) its iteration count relative to
the production remedy (loose inner velocity FGMRES around the V-cycle,
mg_velocity_inner_iters — models/benchmarks.py sticky-air tuning)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.solvers.stokes_solver import solve_stokes


def _sharp_problem(nx=64, contrast=1e6, seed=5):
    """Two-layer viscosity with a cell-sharp horizontal interface and a
    random density field driving flow across it."""
    grid = StaggeredGrid(nx=nx, ny=nx, lx=1.0, ly=1.0)
    bcs = VelocityBCs()
    f64 = jnp.float64
    yc = np.asarray(grid.y_corner)
    eta_col = np.where(yc < 0.35, contrast, 1.0)
    eta_s = jnp.asarray(np.broadcast_to(eta_col[:, None], grid.shape_corner), f64)
    ycn = np.asarray(grid.y_center)
    eta_n = jnp.asarray(
        np.broadcast_to(np.where(ycn < 0.35, contrast, 1.0)[:, None],
                        grid.shape_center), f64
    )
    rng = np.random.default_rng(seed)
    rho_vy = jnp.asarray(rng.normal(size=grid.shape_vy), f64)
    rho_vx = jnp.zeros(grid.shape_vx, f64)
    return grid, bcs, eta_s, eta_n, rho_vx, rho_vy


@pytest.mark.slow
def test_vanka_converges_at_1e6_sharp_contrast():
    from functools import partial

    from pylamp_tpu.solvers.mg import make_mg_preconditioner
    from pylamp_tpu.solvers.vanka import make_vanka_mg_preconditioner

    grid, bcs, eta_s, eta_n, rho_vx, rho_vy = _sharp_problem()

    def run(mk, restart):
        sol = solve_stokes(
            eta_s, eta_n, rho_vx, rho_vy, 0.0, 1.0, grid, bcs,
            tol=1e-8, restart=restart, maxiter=1500, make_preconditioner=mk,
        )
        return int(sol.info.iterations), bool(sol.info.converged)

    it_vanka, ok_vanka = run(
        partial(make_vanka_mg_preconditioner, cycles=1,
                pre_smooth=2, post_smooth=2),
        restart=60,
    )
    assert ok_vanka, f"vanka preconditioner failed to converge ({it_vanka})"

    # production sharp-contrast remedy for comparison (sticky-air tuning)
    it_inner, ok_inner = run(
        partial(make_mg_preconditioner, pre_smooth=8, post_smooth=8,
                velocity_inner_iters=10, velocity_inner_tol=1e-2),
        restart=60,
    )
    assert ok_inner

    # the vanka path must sit far below the >~1500-iteration pathology of
    # the plain one-V-cycle diag-Schur preconditioner at this contrast.
    # MEASURED (64^2, random rho across the 1e6 jump): vanka 282, inner
    # FGMRES 717 — on this noise-forced synthetic the coupled smoother
    # BEATS the production sticky-air remedy (whose tuning assumed smooth
    # buoyancy); the comparator only has to converge within maxiter.
    assert it_vanka < 400, it_vanka
    assert it_inner < 1200, it_inner
    print(f"vanka iters={it_vanka}, inner-FGMRES iters={it_inner}")
