"""Moving-wall (prescribed tangential velocity) BCs.

Rigid-translation test: with both horizontal walls no-slip moving at vt and
matching normal inflow/outflow vn = vt on the side walls, the exact solution
is uniform vx = vt, vy = 0.  A wrong moving-wall ghost-elimination constant
in stokes_rhs would leave a residual at the wall-adjacent rows, so this
validates the affine BC terms exactly."""
import numpy as np
import jax.numpy as jnp

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.ops.stokes import stokes_operator, stokes_rhs
from pylamp_tpu.solvers.stokes_solver import solve_stokes


def test_rigid_translation_exact():
    grid = StaggeredGrid(nx=12, ny=10, lx=1.0, ly=2.0)
    vt = 1.5
    bcs = VelocityBCs(
        top="no_slip", bottom="no_slip", left="free_slip", right="free_slip",
        vt_top=vt, vt_bottom=vt, vn_left=vt, vn_right=vt,
    )
    Yc, Xc = np.meshgrid(grid.y_corner, grid.x_corner, indexing="ij")
    Ycc, Xcc = np.meshgrid(grid.y_center, grid.x_center, indexing="ij")
    eta_s = jnp.asarray(np.exp(Xc + 0.5 * Yc))  # smooth variable viscosity
    eta_n = jnp.asarray(np.exp(Xcc + 0.5 * Ycc))

    # exact discrete solution: A(v*, p=0) == rhs
    vx_star = jnp.full(grid.shape_vx, vt)
    vy_star = jnp.zeros(grid.shape_vy)
    p_star = jnp.zeros(grid.shape_center)
    kcont, kbnd = 3.0, 11.0
    rx, ry, rc = stokes_operator(vx_star, vy_star, p_star, eta_s, eta_n,
                                 grid, bcs, kcont=kcont, kbnd=kbnd)
    bx, by, bc = stokes_rhs(jnp.zeros(grid.shape_vx), jnp.zeros(grid.shape_vy),
                            0.0, 0.0, grid, bcs, kbnd=kbnd,
                            dtype=jnp.float64, eta_s=eta_s)
    np.testing.assert_allclose(np.asarray(rx), np.asarray(bx), atol=1e-11)
    np.testing.assert_allclose(np.asarray(ry), np.asarray(by), atol=1e-11)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(bc), atol=1e-11)

    # and the solver recovers it
    sol = solve_stokes(
        eta_s, eta_n, jnp.zeros(grid.shape_vx), jnp.zeros(grid.shape_vy),
        0.0, 0.0, grid, bcs, tol=1e-10, restart=80, maxiter=2000,
    )
    assert bool(sol.info.converged)
    np.testing.assert_allclose(np.asarray(sol.vx), vt, atol=1e-7 * vt)
    np.testing.assert_allclose(np.asarray(sol.vy), 0.0, atol=1e-7 * vt)


def test_lid_driven_cavity_runs():
    """Classic lid-driven cavity (vt on top only): converges, antisymmetric
    circulation develops, no NaNs."""
    grid = StaggeredGrid(nx=16, ny=16, lx=1.0, ly=1.0)
    bcs = VelocityBCs(top="no_slip", bottom="no_slip", left="no_slip",
                      right="no_slip", vt_top=1.0)
    eta_s = jnp.ones(grid.shape_corner)
    eta_n = jnp.ones(grid.shape_center)
    sol = solve_stokes(
        eta_s, eta_n, jnp.zeros(grid.shape_vx), jnp.zeros(grid.shape_vy),
        0.0, 0.0, grid, bcs, tol=1e-10, restart=80, maxiter=2000,
    )
    assert bool(sol.info.converged)
    vx = np.asarray(sol.vx)
    assert np.all(np.isfinite(vx))
    assert vx[0, :].mean() > 0.3  # driven top row moves with the lid
    assert abs(vx[-1, :].mean()) < 0.05  # static bottom
    # return flow below the lid
    assert vx[grid.ny // 2, :].mean() < 0.0