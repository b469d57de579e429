"""Semi-coarsening multigrid for anisotropic cells (solvers/mg.py
coarsening_plan + directional transfers).

The reference has no multigrid at all (SURVEY.md §2.1 "Sparse solve":
scipy spsolve); semi-coarsening is part of this framework's spsolve
replacement for stretched/high-aspect grids — the classical point-smoother
remedy: coarsen only the axis with the finer spacing (strong 1/h^2
coupling) until the cell aspect rebalances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid, geometric_edges
from pylamp_tpu.solvers.mg import (
    coarsening_plan,
    num_levels,
    prolong_vx,
    prolong_vy,
    restrict_vx,
    restrict_vy,
)

jax.config.update("jax_enable_x64", True)


# -- plan construction ---------------------------------------------------------


def test_plan_square_cells_matches_full_coarsening():
    g = StaggeredGrid(nx=64, ny=64, lx=1.0, ly=1.0)
    plan = coarsening_plan(g, semi_threshold=2.0)
    assert plan == [(True, True)] * (num_levels(g) - 1)


def test_plan_uniform_anisotropic_cells():
    # dy = 4 dx: coarsen x alone twice, then full-coarsen
    g = StaggeredGrid(nx=64, ny=16, lx=1.0, ly=1.0)
    plan = coarsening_plan(g, semi_threshold=2.0)
    assert plan[:2] == [(True, False), (True, False)]
    assert all(s == (True, True) for s in plan[2:])


def test_plan_y_refined_stretched():
    # boundary-layer refinement in y: dy_min << dx -> y-only steps first
    g = StaggeredGrid(nx=32, ny=32, lx=2.0, ly=1.0,
                      y_edges=geometric_edges(32, 1.0, 8.0))
    plan = coarsening_plan(g, semi_threshold=2.0)
    assert plan[0] == (False, True)
    assert (True, True) in plan


def test_plan_disabled_reproduces_num_levels():
    for nx, ny in ((64, 64), (64, 16), (48, 32)):
        g = StaggeredGrid(nx=nx, ny=ny, lx=1.0, ly=1.0)
        plan = coarsening_plan(g, semi_threshold=0.0)
        assert plan == [(True, True)] * (num_levels(g) - 1)


def test_grid_coarsen_single_axis():
    g = StaggeredGrid(nx=8, ny=6, lx=2.0, ly=1.0,
                      y_edges=geometric_edges(6, 1.0, 3.0))
    gx = g.coarsen(cx=True, cy=False)
    assert (gx.nx, gx.ny) == (4, 6)
    assert gx.y_edges == g.y_edges  # untouched axis keeps its edges
    gy = g.coarsen(cx=False, cy=True)
    assert (gy.nx, gy.ny) == (8, 3)
    assert gy.y_edges == g.y_edges[::2]


# -- directional transfer adjointness ------------------------------------------


@pytest.mark.parametrize("cx,cy", [(True, False), (False, True)])
@pytest.mark.parametrize("periodic", [False, True])
def test_semi_transfers_adjoint(cx, cy, periodic):
    """R = P^T / 2 along a single coarsened axis: <P c, f> == 2 <c, R f>
    (the transfers zero the Dirichlet subspace on both sides; periodic
    lattices pair solution-like with residual-like arrays exactly as the
    full-coarsening adjointness test in test_periodic_stokes.py)."""
    if periodic:
        bcs = VelocityBCs(left="periodic", right="periodic")
    else:
        bcs = VelocityBCs()
    NY, NX = 6, 8
    fy = 2 * NY if cy else NY
    fx = 2 * NX if cx else NX
    rng = np.random.default_rng(3)

    c = rng.normal(size=(NY, NX + 1))
    f = rng.normal(size=(fy, fx + 1))
    if periodic:
        # solution-like coarse (equal seam columns), residual-like fine
        # (seam pair carries split halves — ops/stokes.py half-row
        # convention)
        c[:, -1] = c[:, 0]
        half = 0.5 * f[:, 0]
        f[:, 0] = half
        f[:, -1] = half
    c, f = jnp.asarray(c), jnp.asarray(f)
    lhs = float(jnp.vdot(prolong_vx(c, bcs, cx=cx, cy=cy), f))
    rhs = 2.0 * float(jnp.vdot(c, restrict_vx(f, bcs, cx=cx, cy=cy)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)

    c = jnp.asarray(rng.normal(size=(NY + 1, NX)))
    f = jnp.asarray(rng.normal(size=(fy + 1, fx)))
    lhs = float(jnp.vdot(prolong_vy(c, bcs, cx=cx, cy=cy), f))
    rhs = 2.0 * float(jnp.vdot(c, restrict_vy(f, bcs, cx=cx, cy=cy)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_semi_transfers_default_unchanged():
    """cx=cy=True is bitwise the historical full-coarsening transfer."""
    bcs = VelocityBCs()
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.normal(size=(6, 9)))
    f = jnp.asarray(rng.normal(size=(12, 17)))
    np.testing.assert_array_equal(prolong_vx(c, bcs),
                                  prolong_vx(c, bcs, cx=True, cy=True))
    np.testing.assert_array_equal(restrict_vx(f, bcs),
                                  restrict_vx(f, bcs, cx=True, cy=True))


# -- end-to-end: semi-coarsened MG solves an anisotropic problem ---------------


def _aniso_problem(ratio_y, nx=32, ny=32):
    grid = StaggeredGrid(nx=nx, ny=ny, lx=2.0, ly=1.0,
                         y_edges=geometric_edges(ny, 1.0, ratio_y))
    bcs = VelocityBCs()
    rng = np.random.default_rng(12)
    eta_s = np.exp(rng.normal(size=grid.shape_corner) * 0.5)
    eta_n = np.exp(rng.normal(size=grid.shape_center) * 0.5)
    yv, xv = grid.coords("vy")
    Xv, Yv = np.meshgrid(xv, yv)
    rho_vy = np.where((np.abs(Xv - 0.9) < 0.4) & (np.abs(Yv - 0.45) < 0.2),
                      2.0, 1.0)
    rho_vx = np.zeros(grid.shape_vx)
    return grid, bcs, eta_s, eta_n, rho_vx, rho_vy


def _solve_iters(grid, bcs, eta_s, eta_n, rho_vx, rho_vy, semicoarsen):
    from functools import partial

    from pylamp_tpu.solvers.mg import make_mg_preconditioner
    from pylamp_tpu.solvers.stokes_solver import solve_stokes

    sol = solve_stokes(
        jnp.asarray(eta_s), jnp.asarray(eta_n),
        jnp.asarray(rho_vx), jnp.asarray(rho_vy), 0.0, 10.0, grid, bcs,
        tol=1e-9, restart=40, maxiter=800,
        make_preconditioner=partial(
            make_mg_preconditioner, pre_smooth=2, post_smooth=2,
            semicoarsen=semicoarsen,
        ),
    )
    return sol, int(sol.info.iterations)


@pytest.mark.slow
def test_semicoarsen_beats_full_coarsening_on_stretched_grid():
    from tests.oracle.stokes_oracle import StokesOracle

    grid, bcs, eta_s, eta_n, rho_vx, rho_vy = _aniso_problem(16.0)

    sol_semi, it_semi = _solve_iters(grid, bcs, eta_s, eta_n, rho_vx, rho_vy,
                                     semicoarsen=2.0)
    assert bool(sol_semi.info.converged)
    _, it_full = _solve_iters(grid, bcs, eta_s, eta_n, rho_vx, rho_vy,
                              semicoarsen=0.0)
    assert it_semi < 0.75 * it_full, (it_semi, it_full)

    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    vx_o, vy_o, _ = oracle.solve(eta_s, eta_n, rho_vx, rho_vy, 0.0, 10.0)
    scale = np.max(np.abs(vy_o))
    np.testing.assert_allclose(np.asarray(sol_semi.vy), vy_o,
                               atol=3e-8 * scale)
    np.testing.assert_allclose(np.asarray(sol_semi.vx), vx_o,
                               atol=3e-8 * scale)
