"""Periodic lateral BCs — Stokes operator, oracle and solver parity.

The domain wraps in x (period lx); array shapes keep a duplicated seam
column on the nx+1-column lattices and operator outputs follow the
half-row convention (ops/stokes.py, core/bc.py).  The oracle assembles
the same wrapped stencil independently (tests/oracle/stokes_oracle.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.ops.stokes import stokes_operator, stokes_rhs
from pylamp_tpu.solvers.stokes_solver import solve_stokes

from tests.oracle.stokes_oracle import StokesOracle

RNG = np.random.default_rng(7)


def _periodic_fields(grid):
    """Random fields, seam-consistent where the lattice duplicates col nx."""
    eta_s = np.exp(RNG.normal(size=grid.shape_corner) * 2.0)
    eta_s[:, -1] = eta_s[:, 0]
    eta_n = np.exp(RNG.normal(size=grid.shape_center) * 2.0)
    vx = RNG.normal(size=grid.shape_vx)
    vx[:, -1] = vx[:, 0]
    vy = RNG.normal(size=grid.shape_vy)
    p = RNG.normal(size=grid.shape_center)
    return eta_s, eta_n, vx, vy, p


def test_periodic_bcs_validation():
    with pytest.raises(ValueError):
        VelocityBCs(left="periodic", right="free_slip")
    with pytest.raises(ValueError):
        VelocityBCs(top="periodic", bottom="periodic",
                    left="periodic", right="periodic")
    bcs = VelocityBCs(left="periodic", right="periodic")
    assert bcs.periodic_x
    assert not VelocityBCs().periodic_x


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
@pytest.mark.parametrize("nx,ny", [(8, 5), (6, 8)])
def test_periodic_operator_matches_oracle(slip, nx, ny):
    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.7, ly=0.9)
    bcs = VelocityBCs(top=slip, bottom="free_slip",
                      left="periodic", right="periodic")
    eta_s, eta_n, vx, vy, p = _periodic_fields(grid)
    kcont, kbnd = 3.7, 11.0

    oracle = StokesOracle(nx, ny, grid.lx, grid.ly, bcs)
    A = oracle.assemble(eta_s, eta_n, kcont=kcont, kbnd=kbnd)
    want = A @ oracle.pack(vx, vy, p)

    rx, ry, rc = stokes_operator(
        jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(p),
        jnp.asarray(eta_s), jnp.asarray(eta_n), grid, bcs,
        kcont=kcont, kbnd=kbnd,
    )
    got = oracle.pack(np.asarray(rx), np.asarray(ry), np.asarray(rc))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # seam rows are equal halves of one physical equation
    np.testing.assert_allclose(np.asarray(rx)[:, 0], np.asarray(rx)[:, -1],
                               rtol=1e-13, atol=1e-13)


def test_periodic_rhs_matches_oracle():
    grid = StaggeredGrid(nx=6, ny=9, lx=2.0, ly=3.0)
    bcs = VelocityBCs(left="periodic", right="periodic")
    rho_vx = RNG.normal(size=grid.shape_vx) + 3.0
    rho_vx[:, -1] = rho_vx[:, 0]
    rho_vy = RNG.normal(size=grid.shape_vy) + 3.0
    gx, gy, kbnd = 0.5, 9.81, 7.0

    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs)
    want = oracle.rhs(rho_vx.copy(), rho_vy.copy(), gx, gy, kbnd=kbnd)
    bx, by, bc = stokes_rhs(
        jnp.asarray(rho_vx), jnp.asarray(rho_vy), gx, gy, grid, bcs,
        kbnd=kbnd, dtype=jnp.float64,
    )
    got = oracle.pack(np.asarray(bx), np.asarray(by), np.asarray(bc))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def _blob_rho(grid, x0, y0, r, lo=1.0, hi=2.0, loc="vy"):
    """Density blob with PERIODIC x-distance (so it can straddle the seam)."""
    y, x = grid.coords(loc)
    X, Y = np.meshgrid(x, y)
    dxp = np.abs(X - x0)
    dxp = np.minimum(dxp, grid.lx - dxp)
    return np.where(dxp**2 + (Y - y0) ** 2 < r**2, hi, lo)


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
def test_periodic_solve_matches_oracle(slip):
    """FGMRES + block-Jacobi on the wrapped system == oracle spsolve, with
    the sinking blob straddling the periodic seam."""
    grid = StaggeredGrid(nx=16, ny=12, lx=1.5, ly=1.0)
    bcs = VelocityBCs(top=slip, bottom=slip,
                      left="periodic", right="periodic")
    eta_s = np.ones(grid.shape_corner)
    eta_n = np.ones(grid.shape_center)
    rho_vx = _blob_rho(grid, 0.02, 0.5, 0.25, loc="vx")
    rho_vx[:, -1] = rho_vx[:, 0]
    rho_vy = _blob_rho(grid, 0.02, 0.5, 0.25, loc="vy")
    gx, gy = 0.0, 10.0

    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs)
    vx_o, vy_o, p_o = oracle.solve(eta_s, eta_n, rho_vx, rho_vy, gx, gy)

    sol = solve_stokes(
        jnp.asarray(eta_s), jnp.asarray(eta_n),
        jnp.asarray(rho_vx), jnp.asarray(rho_vy), gx, gy, grid, bcs,
        tol=1e-11, restart=60, maxiter=3000,
    )
    assert bool(sol.info.converged)
    scale = np.max(np.abs(vy_o))
    np.testing.assert_allclose(np.asarray(sol.vy), vy_o, atol=2e-8 * scale)
    np.testing.assert_allclose(np.asarray(sol.vx), vx_o, atol=2e-8 * scale)
    np.testing.assert_allclose(
        np.asarray(sol.p), p_o, atol=2e-8 * np.max(np.abs(p_o))
    )
    # the solution is seam-consistent
    np.testing.assert_allclose(
        np.asarray(sol.vx)[:, 0], np.asarray(sol.vx)[:, -1], atol=1e-12 * scale
    )


def test_periodic_translation_invariance_solve():
    """Rolling the material field by k cells rolls the solution by k cells —
    the discrete system is exactly translation-invariant in x."""
    grid = StaggeredGrid(nx=12, ny=8, lx=1.0, ly=1.0)
    bcs = VelocityBCs(left="periodic", right="periodic")
    k = 5
    rng = np.random.default_rng(7)  # independent of the module RNG state
    eta_s = np.exp(rng.normal(size=(grid.ny + 1, grid.nx)) * 1.5)
    eta_n = np.exp(rng.normal(size=grid.shape_center) * 1.5)
    rho_vy = _blob_rho(grid, 0.3, 0.4, 0.2, loc="vy")
    rho_vx = np.zeros(grid.shape_vx)

    def solve(es_u, en, rvy):
        es = np.concatenate([es_u, es_u[:, :1]], axis=1)
        sol = solve_stokes(
            jnp.asarray(es), jnp.asarray(en),
            jnp.asarray(np.zeros(grid.shape_vx)), jnp.asarray(rvy),
            0.0, 10.0, grid, bcs, tol=1e-10, restart=200, maxiter=2000,
        )
        assert bool(sol.info.converged)
        return np.asarray(sol.vx), np.asarray(sol.vy), np.asarray(sol.p)

    vx0, vy0, p0 = solve(eta_s, eta_n, rho_vy)
    vx1, vy1, p1 = solve(
        np.roll(eta_s, k, axis=1), np.roll(eta_n, k, axis=1),
        np.roll(rho_vy, k, axis=1),
    )
    scale = np.max(np.abs(vy0))
    # unique columns of vx roll; the duplicate seam column follows col 0
    vx0_u = vx0[:, :-1]
    vx1_u = vx1[:, :-1]
    np.testing.assert_allclose(vx1_u, np.roll(vx0_u, k, axis=1), atol=1e-8 * scale)
    np.testing.assert_allclose(vy1, np.roll(vy0, k, axis=1), atol=1e-8 * scale)
    np.testing.assert_allclose(
        p1, np.roll(p0, k, axis=1), atol=1e-8 * np.max(np.abs(p0))
    )


# -- multigrid ----------------------------------------------------------------

def _residual_like_vx(rng, shape):
    """Random vx-lattice residual vector in the half-row seam convention."""
    f = rng.normal(size=shape)
    half = 0.5 * f[:, 0]
    f[:, 0] = half
    f[:, -1] = half
    return f


def _solution_like_vx(rng, shape):
    f = rng.normal(size=shape)
    f[:, -1] = f[:, 0]
    return f


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
def test_periodic_transfer_adjointness(slip):
    """<P c, f> == 4 <c, R f> in the mixed (solution-like, residual-like)
    pairing of the seam-duplicated lattices."""
    from pylamp_tpu.solvers.mg import (
        prolong_vx, prolong_vy, restrict_vx, restrict_vy,
    )

    rng = np.random.default_rng(3)
    bcs = VelocityBCs(top=slip, bottom=slip, left="periodic", right="periodic")
    # vx lattice: coarse (8, 9) -> fine (16, 17)
    c = jnp.asarray(_solution_like_vx(rng, (8, 9)))
    f = jnp.asarray(_residual_like_vx(rng, (16, 17)))
    lhs = float(jnp.vdot(prolong_vx(c, bcs), f))
    rhs = 4.0 * float(jnp.vdot(c, restrict_vx(f, bcs)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    # vy lattice has no duplicated column
    c2 = jnp.asarray(rng.normal(size=(9, 8)))
    f2 = jnp.asarray(rng.normal(size=(17, 16)))
    lhs2 = float(jnp.vdot(prolong_vy(c2, bcs), f2))
    rhs2 = 4.0 * float(jnp.vdot(c2, restrict_vy(f2, bcs)))
    np.testing.assert_allclose(lhs2, rhs2, rtol=1e-12)


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
def test_periodic_mg_solve_matches_oracle(slip):
    """MG-preconditioned FGMRES on a periodic variable-viscosity problem:
    converges fast and matches the oracle direct solve."""
    from functools import partial

    from pylamp_tpu.solvers.mg import make_mg_preconditioner

    rng = np.random.default_rng(11)
    grid = StaggeredGrid(nx=32, ny=16, lx=2.0, ly=1.0)
    bcs = VelocityBCs(top=slip, bottom=slip,
                      left="periodic", right="periodic")
    # smooth periodic viscosity field with strong contrast
    yc, xc = grid.coords("corner")
    Xc, Yc = np.meshgrid(xc, yc)
    eta_s = np.exp(3.0 * np.sin(2 * np.pi * Xc / grid.lx) * np.sin(np.pi * Yc))
    eta_s[:, -1] = eta_s[:, 0]
    yn, xn = grid.coords("center")
    Xn, Yn = np.meshgrid(xn, yn)
    eta_n = np.exp(3.0 * np.sin(2 * np.pi * Xn / grid.lx) * np.sin(np.pi * Yn))
    rho_vy = _blob_rho(grid, 0.05, 0.5, 0.3, loc="vy")
    rho_vx = np.zeros(grid.shape_vx)

    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs)
    vx_o, vy_o, p_o = oracle.solve(eta_s, eta_n, rho_vx, rho_vy, 0.0, 10.0)

    sol = solve_stokes(
        jnp.asarray(eta_s), jnp.asarray(eta_n),
        jnp.asarray(rho_vx), jnp.asarray(rho_vy), 0.0, 10.0, grid, bcs,
        tol=1e-10, restart=40, maxiter=400,
        make_preconditioner=partial(
            make_mg_preconditioner, pre_smooth=3, post_smooth=3
        ),
    )
    assert bool(sol.info.converged)
    assert int(sol.info.iterations) < 120
    scale = np.max(np.abs(vy_o))
    np.testing.assert_allclose(np.asarray(sol.vy), vy_o, atol=5e-8 * scale)
    np.testing.assert_allclose(np.asarray(sol.vx), vx_o, atol=5e-8 * scale)
    np.testing.assert_allclose(
        np.asarray(sol.vx)[:, 0], np.asarray(sol.vx)[:, -1],
        atol=1e-12 * scale,
    )
