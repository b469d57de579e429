"""Line (tridiagonal) relaxation: PCR solver, momentum line coefficients
vs the oracle matrix, and anisotropic-multigrid convergence."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid, geometric_edges
from pylamp_tpu.solvers.lines import momentum_line_coeffs, tridiag_pcr

from tests.oracle.stokes_oracle import StokesOracle

RNG = np.random.default_rng(77)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 16, 33])
@pytest.mark.parametrize("axis", [0, 1])
def test_tridiag_pcr_matches_dense_solve(n, axis):
    m = 5  # batch width
    shape = (n, m) if axis == 0 else (m, n)
    a = RNG.normal(size=shape)
    c = RNG.normal(size=shape)
    # strict diagonal dominance (the momentum systems are)
    b = np.abs(a) + np.abs(c) + 1.0 + np.abs(RNG.normal(size=shape))
    d = RNG.normal(size=shape)

    x = np.asarray(tridiag_pcr(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(c), jnp.asarray(d), axis=axis))

    for k in range(m):
        ak, bk, ck, dk = (
            (a[:, k], b[:, k], c[:, k], d[:, k]) if axis == 0
            else (a[k], b[k], c[k], d[k])
        )
        T = np.diag(bk) + np.diag(ak[1:], -1) + np.diag(ck[:-1], 1)
        want = np.linalg.solve(T, dk)
        got = x[:, k] if axis == 0 else x[k]
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def _oracle_momentum_matrix(grid, bcs, eta_s, eta_n, kbnd):
    """Velocity-velocity block of the oracle saddle matrix + index maps."""
    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    A = oracle.assemble(eta_s, eta_n, kcont=1.0, kbnd=kbnd).tocsr()

    def idx_of(loc_shape, packer):
        idx = np.zeros(loc_shape, np.int64)
        for j in range(loc_shape[0]):
            for i in range(loc_shape[1]):
                e = np.zeros(loc_shape)
                e[j, i] = 1.0
                idx[j, i] = int(np.argmax(packer(e)))
        return idx

    zx = np.zeros(grid.shape_vx)
    zy = np.zeros(grid.shape_vy)
    zp = np.zeros(grid.shape_center)
    ivx = idx_of(grid.shape_vx, lambda e: np.abs(oracle.pack(e, zy, zp)))
    ivy = idx_of(grid.shape_vy, lambda e: np.abs(oracle.pack(zx, e, zp)))
    return A, ivx, ivy


@pytest.mark.parametrize("stretched", [False, True])
@pytest.mark.parametrize("axis", [0, 1])
def test_momentum_line_coeffs_match_oracle_matrix(stretched, axis):
    nx, ny = 6, 5
    if stretched:
        grid = StaggeredGrid(nx=nx, ny=ny, lx=1.3, ly=0.9,
                             x_edges=geometric_edges(nx, 1.3, 3.0),
                             y_edges=geometric_edges(ny, 0.9, 2.0))
    else:
        grid = StaggeredGrid(nx=nx, ny=ny, lx=1.3, ly=0.9)
    bcs = VelocityBCs(top="no_slip", left="free_slip")
    eta_s = np.exp(RNG.normal(size=grid.shape_corner))
    eta_n = np.exp(RNG.normal(size=grid.shape_center))
    kbnd = 7.0

    A, ivx, ivy = _oracle_momentum_matrix(grid, bcs, eta_s, eta_n, kbnd)
    sub_vx, sup_vx, sub_vy, sup_vy = (
        np.asarray(z) for z in momentum_line_coeffs(
            jnp.asarray(eta_s), jnp.asarray(eta_n), grid, bcs, axis)
    )

    dj, di = (1, 0) if axis == 0 else (0, 1)

    def check(idx, sub, sup, shape):
        for j in range(shape[0]):
            for i in range(shape[1]):
                jm, im = j - dj, i - di
                jp, ip = j + dj, i + di
                want_sub = (
                    A[idx[j, i], idx[jm, im]]
                    if 0 <= jm and 0 <= im else 0.0
                )
                want_sup = (
                    A[idx[j, i], idx[jp, ip]]
                    if jp < shape[0] and ip < shape[1] else 0.0
                )
                np.testing.assert_allclose(sub[j, i], want_sub,
                                           rtol=1e-12, atol=1e-12)
                np.testing.assert_allclose(sup[j, i], want_sup,
                                           rtol=1e-12, atol=1e-12)

    check(ivx, sub_vx, sup_vx, grid.shape_vx)
    check(ivy, sub_vy, sup_vy, grid.shape_vy)


def _aniso_problem(ratio_y, nx=32, ny=32):
    """A y-refined grid (boundary-layer style): cells near y=0 are ~ratio_y
    thinner than at depth -> strong y coupling, the line smoother's case."""
    grid = StaggeredGrid(
        nx=nx, ny=ny, lx=2.0, ly=1.0,
        y_edges=geometric_edges(ny, 1.0, ratio_y),
    )
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


def _solve_iters(grid, bcs, eta_s, eta_n, rho_vx, rho_vy, smoother, omega):
    from functools import partial

    from pylamp_tpu.solvers.mg import make_mg_preconditioner
    from pylamp_tpu.solvers.stokes_solver import solve_stokes

    sol = solve_stokes(
        jnp.asarray(eta_s), jnp.asarray(eta_n),
        jnp.asarray(rho_vx), jnp.asarray(rho_vy), 0.0, 10.0, grid, bcs,
        tol=1e-9, restart=40, maxiter=800,
        make_preconditioner=partial(
            make_mg_preconditioner, pre_smooth=2, post_smooth=2,
            smoother=smoother, omega=omega,
        ),
    )
    return sol, int(sol.info.iterations)


@pytest.mark.slow
def test_line_mg_beats_point_mg_on_anisotropic_grid():
    """On a 16x y-refined grid, alternating-line MG converges in a fraction
    of the Chebyshev-point-MG iterations, and matches the oracle solve."""
    grid, bcs, eta_s, eta_n, rho_vx, rho_vy = _aniso_problem(16.0)

    sol_line, it_line = _solve_iters(grid, bcs, eta_s, eta_n, rho_vx, rho_vy,
                                     "line", omega=0.7)
    assert bool(sol_line.info.converged)

    _, it_cheb = _solve_iters(grid, bcs, eta_s, eta_n, rho_vx, rho_vy,
                              "chebyshev", omega=0.6)
    assert it_line < 0.6 * it_cheb, (it_line, it_cheb)

    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    vx_o, vy_o, _ = oracle.solve(eta_s, eta_n, rho_vx, rho_vy, 0.0, 10.0)
    scale = np.max(np.abs(vy_o))
    np.testing.assert_allclose(np.asarray(sol_line.vy), vy_o,
                               atol=1e-6 * scale)


def test_line_mg_converges_on_uniform_grid():
    """Line smoothing is also a valid (if pricier) smoother on uniform
    grids — sanity guard for the wiring."""
    grid = StaggeredGrid(nx=16, ny=16, lx=1.0, ly=1.0)
    bcs = VelocityBCs()
    rng = np.random.default_rng(3)
    eta_s = np.exp(rng.normal(size=grid.shape_corner) * 0.5)
    eta_n = np.exp(rng.normal(size=grid.shape_center) * 0.5)
    yv, xv = grid.coords("vy")
    Xv, Yv = np.meshgrid(xv, yv)
    rho_vy = np.where((np.abs(Xv - 0.5) < 0.2) & (np.abs(Yv - 0.4) < 0.2),
                      2.0, 1.0)
    sol, iters = _solve_iters(grid, bcs, eta_s, eta_n,
                              np.zeros(grid.shape_vx), rho_vy, "line", 0.7)
    assert bool(sol.info.converged)
    assert iters < 60


@pytest.mark.parametrize("stretched", [False, True])
@pytest.mark.parametrize("axis", [0, 1])
def test_energy_probe_coeffs_match_oracle_matrix(stretched, axis):
    """stencil_line_coeffs (9-comb probe extraction) reproduces the oracle
    energy matrix's sub/super-diagonals exactly, BC rows included."""
    from pylamp_tpu.core.bc import ThermalBC, ThermalBCs
    from pylamp_tpu.ops.energy import energy_operator
    from pylamp_tpu.solvers.lines import stencil_line_coeffs
    from tests.oracle.energy_oracle import EnergyOracle

    nx, ny = 6, 5
    kw = {}
    if stretched:
        kw = dict(x_edges=geometric_edges(nx, 1.3, 3.0),
                  y_edges=geometric_edges(ny, 0.9, 2.0))
    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.3, ly=0.9, **kw)
    bcs = ThermalBCs(top=ThermalBC("neumann", 0.0))
    k = np.exp(RNG.normal(size=grid.shape_corner))
    rc = np.exp(RNG.normal(size=grid.shape_corner))
    kbnd = 5.0

    oracle = EnergyOracle(nx, ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    A = oracle.assemble(k, rc, kbnd=kbnd).tocsr()

    def op(T):
        return energy_operator(T, jnp.asarray(k), jnp.asarray(rc), grid, bcs,
                               kbnd=kbnd)

    sub, sup = (np.asarray(z) for z in stencil_line_coeffs(
        op, grid.shape_corner, axis, jnp.float64))

    ncol = nx + 1
    dj, di = (1, 0) if axis == 0 else (0, 1)
    for j in range(ny + 1):
        for i in range(nx + 1):
            row = j * ncol + i
            jm, im, jp, ip = j - dj, i - di, j + dj, i + di
            want_sub = A[row, jm * ncol + im] if (jm >= 0 and im >= 0) else 0.0
            want_sup = (A[row, jp * ncol + ip]
                        if (jp <= ny and ip <= nx) else 0.0)
            np.testing.assert_allclose(sub[j, i], want_sub,
                                       rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(sup[j, i], want_sup,
                                       rtol=1e-12, atol=1e-12)


def test_energy_line_mg_on_anisotropic_grid():
    """Diffusion-dominated energy solve on a 16x y-refined grid: line-MG
    converges, beats chebyshev-MG's iteration count, matches the oracle."""
    from pylamp_tpu.core.bc import ThermalBCs
    from pylamp_tpu.solvers.energy_solver import solve_energy
    from tests.oracle.energy_oracle import EnergyOracle

    nx = ny = 32
    grid = StaggeredGrid(nx=nx, ny=ny, lx=2.0, ly=1.0,
                         y_edges=geometric_edges(ny, 1.0, 16.0))
    bcs = ThermalBCs()
    rng = np.random.default_rng(8)
    k = np.exp(rng.normal(size=grid.shape_corner) * 0.5)
    T0 = rng.normal(size=grid.shape_corner)
    rc = np.full(grid.shape_corner, 1e-3)  # diffusion-dominated
    H = rng.normal(size=grid.shape_corner) * 0.1

    def run(smoother):
        return solve_energy(
            jnp.asarray(T0), jnp.asarray(k), jnp.asarray(rc), jnp.asarray(H),
            grid, bcs, tol=1e-11, maxiter=600, preconditioner="mg",
            mg_smoother=smoother, mg_omega=0.8,
        )

    sol_line = run("line")
    assert bool(sol_line.info.converged)
    sol_cheb = run("chebyshev")
    assert int(sol_line.info.iterations) < int(sol_cheb.info.iterations)

    oracle = EnergyOracle(nx, ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    want = oracle.solve(T0, k, rc, H)
    np.testing.assert_allclose(np.asarray(sol_line.T), want,
                               atol=1e-8 * np.max(np.abs(want)))


def test_line_smoother_rejects_periodic():
    grid = StaggeredGrid(nx=8, ny=8, lx=1.0, ly=1.0)
    with pytest.raises(ValueError, match="periodic"):
        momentum_line_coeffs(
            jnp.ones(grid.shape_corner), jnp.ones(grid.shape_center),
            grid, VelocityBCs(left="periodic", right="periodic"), 0,
        )
