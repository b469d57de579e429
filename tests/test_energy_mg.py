"""Energy-solve mesh independence (SURVEY.md §3.5): with the MG
preconditioner the CG iteration count must stay flat as the grid is
refined on a diffusion-dominated problem, where Jacobi-CG degrades."""
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.core.bc import ThermalBC, ThermalBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.solvers.energy_solver import solve_energy

BCS = ThermalBCs(
    top=ThermalBC("dirichlet", 0.0),
    bottom=ThermalBC("dirichlet", 1.0),
    left=ThermalBC("neumann", 0.0),
    right=ThermalBC("neumann", 0.0),
)


def _solve(n, preconditioner, rhocp_over_dt=1e-3):
    grid = StaggeredGrid(nx=n, ny=n, lx=1.0, ly=1.0)
    ny1, nx1 = grid.shape_corner
    y = jnp.linspace(0.0, 1.0, ny1)[:, None]
    x = jnp.linspace(0.0, 1.0, nx1)[None, :]
    # variable conductivity (x4 contrast) + a non-conductive initial field
    k = 1.0 + 3.0 * jnp.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / 0.05)
    T0 = y + 0.3 * jnp.sin(2 * jnp.pi * x) * jnp.sin(jnp.pi * y)
    rc = jnp.full_like(T0, rhocp_over_dt)
    H = jnp.zeros_like(T0)
    sol = solve_energy(
        T0, k, rc, H, grid, BCS, tol=1e-10, preconditioner=preconditioner
    )
    return sol


def test_mg_matches_jacobi_solution():
    a = _solve(64, "jacobi")
    b = _solve(64, "mg")
    assert bool(a.info.converged) and bool(b.info.converged)
    np.testing.assert_allclose(np.asarray(a.T), np.asarray(b.T), atol=1e-8)


def test_mg_iterations_flat_under_refinement():
    iters = {}
    for n in (64, 128, 256):
        sol = _solve(n, "mg")
        assert bool(sol.info.converged)
        iters[n] = int(sol.info.iterations)
    # mesh independence: refining 16x in unknowns must stay within ~2x
    # (measured 13 -> 21; Jacobi-CG goes 500 -> 1528 on the same problem)
    assert iters[256] <= 2.0 * iters[64], iters
    # sanity: MG actually beats Jacobi where it is supposed to
    jac = _solve(256, "jacobi")
    assert iters[256] < 0.5 * int(jac.info.iterations), (
        iters[256],
        int(jac.info.iterations),
    )
