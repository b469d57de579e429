"""Periodic lateral BCs — energy operator, oracle and solver parity.

Same seam conventions as the Stokes path (tests/test_periodic_stokes.py):
the corner lattice keeps a duplicated seam column; operator outputs carry
equal halves of the physical equation there.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.core.bc import ThermalBC, ThermalBCs
from pylamp_tpu.ops.energy import energy_operator, energy_rhs
from pylamp_tpu.solvers.energy_solver import solve_energy

from tests.oracle.energy_oracle import EnergyOracle

PER = ThermalBC("periodic", 0.0)


def _bcs(top_kind="dirichlet", bottom_kind="dirichlet"):
    return ThermalBCs(
        top=ThermalBC(top_kind, 0.0),
        bottom=ThermalBC(bottom_kind, 1.0),
        left=PER,
        right=PER,
    )


def _consistent(rng, shape):
    a = rng.normal(size=shape)
    a[:, -1] = a[:, 0]
    return a


def test_periodic_thermal_validation():
    with pytest.raises(ValueError):
        ThermalBCs(left=PER, right=ThermalBC("neumann", 0.0))
    with pytest.raises(ValueError):
        ThermalBCs(top=PER, bottom=PER, left=PER, right=PER)
    assert _bcs().periodic_x


@pytest.mark.parametrize("k_avg", ["arithmetic", "harmonic"])
@pytest.mark.parametrize("top_kind", ["dirichlet", "neumann"])
def test_periodic_energy_operator_matches_oracle(k_avg, top_kind):
    rng = np.random.default_rng(5)
    grid = StaggeredGrid(nx=8, ny=6, lx=1.4, ly=0.8)
    bcs = _bcs(top_kind=top_kind)
    k = np.exp(_consistent(rng, grid.shape_corner))
    T = _consistent(rng, grid.shape_corner)
    rc = np.exp(_consistent(rng, grid.shape_corner))
    kbnd = 5.0

    oracle = EnergyOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs, k_avg=k_avg)
    A = oracle.assemble(k, rc, kbnd=kbnd)
    want = (A @ T.ravel()).reshape(grid.shape_corner)
    # oracle Dirichlet rows are kbnd*T_bc in assemble-convention: emulate the
    # operator's kbnd*T rows by comparing the non-Dirichlet entries plus
    # checking the Dirichlet rows directly
    got = np.asarray(
        energy_operator(
            jnp.asarray(T), jnp.asarray(k), jnp.asarray(rc), grid, bcs,
            kbnd=kbnd, k_avg=k_avg,
        )
    )
    mask, _ = oracle._dirichlet_mask()
    np.testing.assert_allclose(got[~mask], want[~mask], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got[mask], kbnd * T[mask], rtol=1e-13)
    # seam rows are equal halves
    np.testing.assert_allclose(got[:, 0][~mask[:, 0]], got[:, -1][~mask[:, -1]],
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("preconditioner", ["jacobi", "mg"])
def test_periodic_energy_solve_matches_oracle(preconditioner):
    rng = np.random.default_rng(9)
    grid = StaggeredGrid(nx=16, ny=12, lx=2.0, ly=1.0)
    bcs = _bcs()
    k = np.exp(_consistent(rng, grid.shape_corner) * 0.5)
    T0 = _consistent(rng, grid.shape_corner)
    rc = np.exp(_consistent(rng, grid.shape_corner) * 0.5) * 3.0
    H = _consistent(rng, grid.shape_corner) * 0.1

    oracle = EnergyOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs)
    want = oracle.solve(T0, k, rc, H)

    sol = solve_energy(
        jnp.asarray(T0), jnp.asarray(k), jnp.asarray(rc), jnp.asarray(H),
        grid, bcs, tol=1e-12, maxiter=2000, preconditioner=preconditioner,
    )
    assert bool(sol.info.converged)
    got = np.asarray(sol.T)
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=1e-9 * scale)
    np.testing.assert_allclose(got[:, 0], got[:, -1], atol=1e-12 * scale)


def test_periodic_energy_translation_invariance():
    """Rolling k/T/H by j cells rolls the solution by j cells."""
    rng = np.random.default_rng(13)
    grid = StaggeredGrid(nx=12, ny=8, lx=1.0, ly=1.0)
    bcs = _bcs()
    j = 4
    ku = np.exp(rng.normal(size=(grid.ny + 1, grid.nx)) * 0.5)
    T0u = rng.normal(size=(grid.ny + 1, grid.nx))
    rcu = np.exp(rng.normal(size=(grid.ny + 1, grid.nx)) * 0.5) * 2.0

    def dup(a):
        return np.concatenate([a, a[:, :1]], axis=1)

    def solve(ku, T0u, rcu):
        sol = solve_energy(
            jnp.asarray(dup(T0u)), jnp.asarray(dup(ku)), jnp.asarray(dup(rcu)),
            jnp.zeros(grid.shape_corner), grid, bcs, tol=1e-12, maxiter=2000,
        )
        assert bool(sol.info.converged)
        return np.asarray(sol.T)[:, :-1]

    a = solve(ku, T0u, rcu)
    b = solve(np.roll(ku, j, 1), np.roll(T0u, j, 1), np.roll(rcu, j, 1))
    np.testing.assert_allclose(b, np.roll(a, j, 1), atol=1e-10 * np.max(np.abs(a)))


def test_periodic_energy_mg_mesh_independence():
    """Iteration count stays roughly flat with grid refinement for a
    diffusion-dominated periodic problem."""
    iters = []
    for n in (32, 64, 128):
        grid = StaggeredGrid(nx=n, ny=n, lx=1.0, ly=1.0)
        bcs = _bcs()
        y, x = grid.coords("corner")
        X, Y = np.meshgrid(x, y)
        k = np.exp(np.sin(2 * np.pi * X) * np.cos(np.pi * Y))
        T0 = np.sin(4 * np.pi * X) * np.sin(np.pi * Y)
        T0[:, -1] = T0[:, 0]
        rc = np.full(grid.shape_corner, 1e-3)  # diffusion-dominated
        sol = solve_energy(
            jnp.asarray(T0), jnp.asarray(k), jnp.asarray(rc),
            jnp.zeros(grid.shape_corner), grid, bcs,
            tol=1e-10, maxiter=400, preconditioner="mg",
        )
        assert bool(sol.info.converged)
        iters.append(int(sol.info.iterations))
    assert iters[-1] <= iters[0] + 12, iters
