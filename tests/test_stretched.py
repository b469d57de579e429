"""Non-uniform (stretched) grids — operators, oracle and solver parity.

The stretched discretization (ops/stretched.py) is the Gerya variable-grid
generalization of the uniform stencils; with uniform edge arrays it must
reproduce the uniform operators exactly, and on genuinely stretched grids
it must match an independently assembled scipy matrix to 1e-12.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylamp_tpu.core.grid import StaggeredGrid, geometric_edges, refined_band_edges
from pylamp_tpu.core.bc import ThermalBC, ThermalBCs, VelocityBCs
from pylamp_tpu.ops.energy import energy_operator, energy_rhs
from pylamp_tpu.ops.stokes import stokes_operator, stokes_rhs
from pylamp_tpu.solvers.stokes_solver import solve_stokes
from pylamp_tpu.solvers.energy_solver import solve_energy

from tests.oracle.stokes_oracle import StokesOracle
from tests.oracle.energy_oracle import EnergyOracle

RNG = np.random.default_rng(21)


def _stretched_grid(nx=10, ny=8, lx=1.7, ly=0.9):
    xe = geometric_edges(nx, lx, 3.0)
    ye = refined_band_edges(ny, ly, 0.3 * ly, 0.3 * ly, 4.0)
    return StaggeredGrid(nx=nx, ny=ny, lx=lx, ly=ly, x_edges=xe, y_edges=ye)


def test_grid_validation_and_helpers():
    g = _stretched_grid()
    assert not g.uniform
    with pytest.raises(ValueError):
        g.dx  # scalar spacing undefined on a stretched axis
    assert g.dxs.shape == (g.nx,)
    np.testing.assert_allclose(g.dxs.sum(), g.lx, rtol=1e-12)
    np.testing.assert_allclose(g.dys.sum(), g.ly, rtol=1e-12)
    assert g.dxs[-1] / g.dxs[0] == pytest.approx(3.0, rel=1e-6)
    c = g.coarsen()
    assert c.nx == g.nx // 2 and not c.uniform
    np.testing.assert_allclose(np.asarray(c.x_corner), g.x_corner[::2])
    with pytest.raises(ValueError):
        StaggeredGrid(nx=4, ny=4, lx=1.0, ly=1.0, x_edges=(0, 0.5, 0.4, 0.8, 1.0))
    # uniform grid still exposes scalar spacing
    u = StaggeredGrid(nx=4, ny=4, lx=1.0, ly=1.0)
    assert u.uniform and u.dx == 0.25 and u.dx_min == 0.25


def test_uniform_edges_degenerate_to_uniform_operator():
    """Explicit uniform edge tuples give the same operator values as the
    uniform fast path (same formulas, array-broadcast form)."""
    nx, ny, lx, ly = 8, 6, 1.3, 0.9
    gu = StaggeredGrid(nx=nx, ny=ny, lx=lx, ly=ly)
    xe = tuple(np.linspace(0.0, lx, nx + 1))
    ye = tuple(np.linspace(0.0, ly, ny + 1))
    gs = StaggeredGrid(nx=nx, ny=ny, lx=lx, ly=ly, x_edges=xe, y_edges=ye)
    assert not gs.uniform

    bcs = VelocityBCs(top="no_slip")
    eta_s = np.exp(RNG.normal(size=gu.shape_corner))
    eta_n = np.exp(RNG.normal(size=gu.shape_center))
    vx = RNG.normal(size=gu.shape_vx)
    vy = RNG.normal(size=gu.shape_vy)
    p = RNG.normal(size=gu.shape_center)
    want = stokes_operator(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(p),
                           jnp.asarray(eta_s), jnp.asarray(eta_n), gu, bcs,
                           kcont=3.0, kbnd=9.0)
    got = stokes_operator(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(p),
                          jnp.asarray(eta_s), jnp.asarray(eta_n), gs, bcs,
                          kcont=3.0, kbnd=9.0)
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
def test_stretched_stokes_operator_matches_oracle(slip):
    grid = _stretched_grid()
    bcs = VelocityBCs(top=slip, bottom="free_slip", left="no_slip", right=slip)
    eta_s = np.exp(RNG.normal(size=grid.shape_corner) * 1.5)
    eta_n = np.exp(RNG.normal(size=grid.shape_center) * 1.5)
    vx = RNG.normal(size=grid.shape_vx)
    vy = RNG.normal(size=grid.shape_vy)
    p = RNG.normal(size=grid.shape_center)
    kcont, kbnd = 3.7, 11.0

    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    A = oracle.assemble(eta_s, eta_n, kcont=kcont, kbnd=kbnd)
    want = A @ oracle.pack(vx, vy, p)

    rx, ry, rc = stokes_operator(
        jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(p),
        jnp.asarray(eta_s), jnp.asarray(eta_n), grid, bcs,
        kcont=kcont, kbnd=kbnd,
    )
    got = oracle.pack(np.asarray(rx), np.asarray(ry), np.asarray(rc))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-10)


def test_stretched_uniform_oracle_backcompat():
    """The generalized oracle assembly reproduces the uniform one."""
    grid = StaggeredGrid(nx=7, ny=5, lx=1.3, ly=0.9)
    bcs = VelocityBCs()
    eta_s = np.exp(RNG.normal(size=grid.shape_corner))
    eta_n = np.exp(RNG.normal(size=grid.shape_center))
    vx = RNG.normal(size=grid.shape_vx)
    vy = RNG.normal(size=grid.shape_vy)
    p = RNG.normal(size=grid.shape_center)
    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs)
    A = oracle.assemble(eta_s, eta_n, kcont=2.0, kbnd=5.0)
    want = A @ oracle.pack(vx, vy, p)
    rx, ry, rc = stokes_operator(
        jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(p),
        jnp.asarray(eta_s), jnp.asarray(eta_n), grid, bcs, kcont=2.0, kbnd=5.0,
    )
    got = oracle.pack(np.asarray(rx), np.asarray(ry), np.asarray(rc))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("k_avg", ["arithmetic", "harmonic"])
@pytest.mark.parametrize("top_kind", ["dirichlet", "neumann"])
def test_stretched_energy_operator_matches_oracle(k_avg, top_kind):
    grid = _stretched_grid()
    bcs = ThermalBCs(top=ThermalBC(top_kind, 0.3))
    k = np.exp(RNG.normal(size=grid.shape_corner))
    T = RNG.normal(size=grid.shape_corner)
    rc = np.exp(RNG.normal(size=grid.shape_corner))
    kbnd = 5.0

    oracle = EnergyOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs, k_avg=k_avg,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    A = oracle.assemble(k, rc, kbnd=kbnd)
    want = (A @ T.ravel()).reshape(grid.shape_corner)
    got = np.asarray(energy_operator(
        jnp.asarray(T), jnp.asarray(k), jnp.asarray(rc), grid, bcs,
        kbnd=kbnd, k_avg=k_avg,
    ))
    mask, _ = oracle._dirichlet_mask()
    np.testing.assert_allclose(got[~mask], want[~mask], rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(got[mask], kbnd * T[mask], rtol=1e-13)

    # RHS with a nonzero Neumann flux on a stretched wall
    H = RNG.normal(size=grid.shape_corner) * 0.1
    bcs2 = ThermalBCs(top=ThermalBC(top_kind, 0.3),
                      left=ThermalBC("neumann", 0.7))
    oracle2 = EnergyOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs2, k_avg=k_avg,
                           x_edges=grid.x_edges, y_edges=grid.y_edges)
    want_b = oracle2.rhs(T, k, rc, H, kbnd=kbnd).reshape(grid.shape_corner)
    got_b = np.asarray(energy_rhs(
        jnp.asarray(T), jnp.asarray(k), jnp.asarray(rc), jnp.asarray(H),
        grid, bcs2, kbnd=kbnd, k_avg=k_avg,
    ))
    np.testing.assert_allclose(got_b, want_b, rtol=1e-12, atol=1e-12)


def test_stretched_stokes_solve_matches_oracle():
    """FGMRES (block-Jacobi) on the stretched system == oracle spsolve."""
    grid = _stretched_grid(nx=16, ny=12, lx=1.5, ly=1.0)
    bcs = VelocityBCs()
    eta_s = np.ones(grid.shape_corner)
    eta_n = np.ones(grid.shape_center)
    yv, xv = grid.coords("vy")
    Xv, Yv = np.meshgrid(xv, yv)
    rho_vy = np.where((np.abs(Xv - 0.6) < 0.3) & (np.abs(Yv - 0.4) < 0.25),
                      2.0, 1.0)
    rho_vx = np.zeros(grid.shape_vx)

    oracle = StokesOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    vx_o, vy_o, p_o = oracle.solve(eta_s, eta_n, rho_vx, rho_vy, 0.0, 10.0)

    sol = solve_stokes(
        jnp.asarray(eta_s), jnp.asarray(eta_n),
        jnp.asarray(rho_vx), jnp.asarray(rho_vy), 0.0, 10.0, grid, bcs,
        tol=1e-11, restart=80, maxiter=4000,
    )
    assert bool(sol.info.converged)
    scale = np.max(np.abs(vy_o))
    np.testing.assert_allclose(np.asarray(sol.vy), vy_o, atol=3e-8 * scale)
    np.testing.assert_allclose(np.asarray(sol.vx), vx_o, atol=3e-8 * scale)


def test_stretched_mg_solve_matches_oracle():
    """The rediscretized-multigrid preconditioner works on stretched grids
    (edge-dropping coarsening; index-based transfers)."""
    from functools import partial

    from pylamp_tpu.solvers.mg import make_mg_preconditioner

    nx, ny = 32, 16
    xe = geometric_edges(nx, 2.0, 4.0)
    ye = geometric_edges(ny, 1.0, 3.0)
    grid = StaggeredGrid(nx=nx, ny=ny, lx=2.0, ly=1.0, x_edges=xe, y_edges=ye)
    bcs = VelocityBCs()
    rng = np.random.default_rng(4)
    eta_s = np.exp(rng.normal(size=grid.shape_corner))
    eta_n = np.exp(rng.normal(size=grid.shape_center))
    yv, xv = grid.coords("vy")
    Xv, Yv = np.meshgrid(xv, yv)
    rho_vy = np.where((np.abs(Xv - 0.9) < 0.4) & (np.abs(Yv - 0.45) < 0.2),
                      2.0, 1.0)
    rho_vx = np.zeros(grid.shape_vx)

    oracle = StokesOracle(nx, ny, 2.0, 1.0, bcs, x_edges=xe, y_edges=ye)
    vx_o, vy_o, p_o = oracle.solve(eta_s, eta_n, rho_vx, rho_vy, 0.0, 10.0)

    sol = solve_stokes(
        jnp.asarray(eta_s), jnp.asarray(eta_n),
        jnp.asarray(rho_vx), jnp.asarray(rho_vy), 0.0, 10.0, grid, bcs,
        tol=1e-10, restart=40, maxiter=600,
        make_preconditioner=partial(
            make_mg_preconditioner, pre_smooth=3, post_smooth=3
        ),
    )
    assert bool(sol.info.converged)
    # point-smoothed MG degrades with cell-aspect anisotropy (4x geometric
    # stretch on both axes here); it still converges robustly — line
    # smoothing / semi-coarsening is the known upgrade for extreme stretch
    assert int(sol.info.iterations) < 450
    scale = np.max(np.abs(vy_o))
    np.testing.assert_allclose(np.asarray(sol.vy), vy_o, atol=1e-7 * scale)
    np.testing.assert_allclose(np.asarray(sol.vx), vx_o, atol=1e-7 * scale)


def test_stretched_energy_solve_matches_oracle():
    grid = _stretched_grid(nx=16, ny=12, lx=2.0, ly=1.0)
    bcs = ThermalBCs()
    rng = np.random.default_rng(6)
    k = np.exp(rng.normal(size=grid.shape_corner) * 0.5)
    T0 = rng.normal(size=grid.shape_corner)
    rc = np.exp(rng.normal(size=grid.shape_corner) * 0.5) * 3.0
    H = rng.normal(size=grid.shape_corner) * 0.1

    oracle = EnergyOracle(grid.nx, grid.ny, grid.lx, grid.ly, bcs,
                          x_edges=grid.x_edges, y_edges=grid.y_edges)
    want = oracle.solve(T0, k, rc, H)

    sol = solve_energy(
        jnp.asarray(T0), jnp.asarray(k), jnp.asarray(rc), jnp.asarray(H),
        grid, bcs, tol=1e-12, maxiter=3000,
    )
    assert bool(sol.info.converged)
    np.testing.assert_allclose(np.asarray(sol.T), want,
                               atol=1e-9 * np.max(np.abs(want)))


# -- markers + whole step -----------------------------------------------------

def test_stretched_marker_transfers():
    """Flat-engine marker<->grid on a stretched grid: partition of unity
    (uniform marker value -> exact field) and bilinear exactness on linear
    fields (tensor-product lattices reproduce a+bx+cy exactly)."""
    from pylamp_tpu.markers.interp import grid_to_markers, markers_to_grid

    grid = _stretched_grid(nx=12, ny=10)
    rng = np.random.default_rng(3)
    n = 2000
    px = jnp.asarray(rng.uniform(1e-9, grid.lx - 1e-9, n))
    py = jnp.asarray(rng.uniform(1e-9, grid.ly - 1e-9, n))

    for loc in ("corner", "center", "vx", "vy"):
        field, w = markers_to_grid(px, py, jnp.full(n, 2.5), grid, loc)
        f = np.asarray(field)
        np.testing.assert_allclose(f[np.asarray(w) > 0], 2.5, rtol=1e-12)

        ys, xs = grid.coords(loc)
        X, Y = np.meshgrid(xs, ys)
        lin = jnp.asarray(0.7 + 1.3 * X - 2.1 * Y)
        got = grid_to_markers(lin, px, py, grid, loc)
        want = 0.7 + 1.3 * np.asarray(px) - 2.1 * np.asarray(py)
        # linear exactness holds inside the node-lattice hull; outside it
        # the gather clamps to the outermost cell (by design, like the
        # uniform path)
        inside = ((np.asarray(px) >= xs[0]) & (np.asarray(px) <= xs[-1])
                  & (np.asarray(py) >= ys[0]) & (np.asarray(py) <= ys[-1]))
        np.testing.assert_allclose(np.asarray(got)[inside], want[inside],
                                   rtol=1e-10, atol=1e-12)


def test_stretched_advect_uniform_flow():
    """Constant velocity advects markers by exactly v*dt on a stretched
    grid (RK4 through a constant field is exact)."""
    from pylamp_tpu.markers.advect import advect_rk4

    grid = _stretched_grid(nx=12, ny=10)
    rng = np.random.default_rng(5)
    n = 500
    px = jnp.asarray(rng.uniform(0.1, grid.lx - 0.1, n))
    py = jnp.asarray(rng.uniform(0.1, grid.ly - 0.1, n))
    cx, cy = 0.03, -0.02
    vx = jnp.full(grid.shape_vx, cx)
    vy = jnp.full(grid.shape_vy, cy)
    bcs = VelocityBCs()
    qx, qy = advect_rk4(px, py, vx, vy, 1.0, grid, bcs)
    np.testing.assert_allclose(np.asarray(qx), np.asarray(px) + cx, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(qy), np.asarray(py) + cy, rtol=1e-12)


def _flat_cell_markers(grid, material_of, dtype=jnp.float64, m=2):
    """Deterministic per-cell marker set (same PHYSICAL positions whichever
    grid object is passed, as long as the edges coincide)."""
    from pylamp_tpu.markers.state import MarkerState

    frac = (np.arange(m) + 0.5) / m
    xe, ye = grid.x_corner, grid.y_corner
    dxc = np.diff(xe)
    dyc = np.diff(ye)
    xs = (xe[:-1][None, :, None, None] + frac[None, None, None, :] * dxc[None, :, None, None])
    ys = (ye[:-1][:, None, None, None] + frac[None, None, :, None] * dyc[:, None, None, None])
    x = np.broadcast_to(xs, (grid.ny, grid.nx, m, m)).ravel()
    y = np.broadcast_to(ys, (grid.ny, grid.nx, m, m)).ravel()
    mat = material_of(x, y).astype(np.int32)
    return MarkerState(x=jnp.asarray(x, dtype), y=jnp.asarray(y, dtype),
                       mat=jnp.asarray(mat), T=jnp.zeros(x.shape, dtype))


def test_stretched_uniform_edges_step_equals_uniform_step():
    """The ENTIRE production step (flat engine) on a stretched grid whose
    edges happen to be uniform == the uniform-grid step, with an identical
    hand-built marker set."""
    import dataclasses as dc

    import jax

    from pylamp_tpu.models.benchmarks import falling_block
    from pylamp_tpu.models.state import zero_state
    from pylamp_tpu.models.step import make_step
    from pylamp_tpu.physics.materials import MaterialTable

    base = falling_block(nx=16, ny=16, max_steps=2)
    base = dc.replace(base, marker_engine="flat")
    xe = tuple(np.linspace(0.0, 1.0, 17))
    cfgs = [base, dc.replace(base, x_edges=xe, y_edges=xe)]

    results = []
    for cfg in cfgs:
        grid = StaggeredGrid(nx=cfg.nx, ny=cfg.ny, lx=cfg.lx, ly=cfg.ly,
                             x_edges=cfg.x_edges, y_edges=cfg.y_edges)
        table = MaterialTable(cfg.physics.materials)
        markers = _flat_cell_markers(grid, cfg.material_of)
        state = zero_state(grid, markers, jnp.float64)
        state = state.replace(eta_s=jnp.ones(grid.shape_corner),
                              eta_n=jnp.ones(grid.shape_center))
        step = jax.jit(make_step(grid, cfg, table))
        for _ in range(2):
            state, diag = step(state)
        assert bool(diag["stokes_converged"])
        results.append(state)

    a, b = results
    scale = float(jnp.max(jnp.abs(a.vy)))
    assert scale > 0
    np.testing.assert_allclose(np.asarray(b.vy), np.asarray(a.vy),
                               atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(b.vx), np.asarray(a.vx),
                               atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(b.markers.x), np.asarray(a.markers.x),
                               atol=1e-12)


def test_stretched_e2e_refined_block():
    """Full build() + step on a genuinely stretched grid (refined band
    around the block): converges, block sinks, markers stay in bounds."""
    import dataclasses as dc

    import jax

    from pylamp_tpu.models.benchmarks import falling_block
    from pylamp_tpu.models.setup import build
    from pylamp_tpu.models.step import make_step
    from pylamp_tpu.physics.materials import MaterialTable

    cfg = falling_block(nx=16, ny=16, max_steps=3)
    cfg = dc.replace(
        cfg, marker_engine="flat",
        x_edges=refined_band_edges(16, 1.0, 0.5, 0.5, 3.0),
        y_edges=refined_band_edges(16, 1.0, 0.3, 0.4, 3.0),
    )
    grid, table, state = build(cfg, dtype=jnp.float64)
    step = jax.jit(make_step(grid, cfg, table))
    for _ in range(3):
        state, diag = step(state)
        assert bool(diag["stokes_converged"])
    vy = np.asarray(state.vy)
    assert np.isfinite(vy).all()
    assert vy.max() > 0  # the dense block sinks (y points down)
    x = np.asarray(state.markers.x)
    y = np.asarray(state.markers.y)
    assert (x >= 0).all() and (x <= grid.lx).all()
    assert (y >= 0).all() and (y <= grid.ly).all()


# -- dense bucket engine on stretched grids ------------------------------------
#
# The bucket engine's windowed locate (markers/bucket.py _axis_locate) must
# reproduce the flat engine's searchsorted locate exactly; the flat stretched
# path is oracle-verified above, so flat is the reference here.

# Bucket capacity for the equivalence tests: markers drawn uniformly in
# SPACE pile into the BIG cells of a stretched grid (count ~ cell area),
# so the capacity must cover the largest cell's expected population.
BK = 48


def _bucket_fixture(grid, n=700, seed=5):
    from pylamp_tpu.markers.bucket import bucket_from_flat

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(1e-9, grid.lx - 1e-9, n))
    y = jnp.asarray(rng.uniform(1e-9, grid.ly - 1e-9, n))
    mat = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
    T = jnp.asarray(np.exp(rng.normal(size=n)))  # positive (geometric mean)
    bm = bucket_from_flat(x, y, mat, T, grid, BK)
    assert int(bm.total()) == n  # no capacity drops in the fixture
    return x, y, mat, T, bm


def _bucket_to_flat_order(bm, x):
    """Index arrays pairing the bucket's valid slots with the flat set
    (sorted by x coordinate; positions are unique with probability 1)."""
    from pylamp_tpu.markers.bucket import flatten

    fx = np.asarray(flatten(bm)[0])
    fv = np.asarray(flatten(bm)[4]).astype(bool)
    return fv, np.argsort(fx[fv]), np.argsort(np.asarray(x))


@pytest.mark.parametrize("loc", ["corner", "center", "vx", "vy"])
@pytest.mark.parametrize("mode", ["arithmetic", "geometric"])
def test_stretched_bucket_m2g_matches_flat(loc, mode):
    from pylamp_tpu.markers.bucket import bucket_markers_to_grid
    from pylamp_tpu.markers.interp import markers_to_grid

    grid = _stretched_grid(nx=12, ny=10)
    x, y, mat, T, bm = _bucket_fixture(grid)
    want, want_w = markers_to_grid(x, y, T, grid, loc, mode)
    got, got_w = bucket_markers_to_grid(bm, bm.T, grid, loc, mode)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               atol=1e-12)
    covered = np.asarray(want_w) > 0
    np.testing.assert_allclose(np.asarray(got)[covered],
                               np.asarray(want)[covered],
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("loc", ["corner", "center", "vx", "vy"])
def test_stretched_bucket_g2m_matches_flat(loc):
    from pylamp_tpu.markers.bucket import bucket_grid_to_markers
    from pylamp_tpu.markers.interp import grid_to_markers

    grid = _stretched_grid(nx=12, ny=10)
    x, y, mat, T, bm = _bucket_fixture(grid, seed=7)
    field = jnp.asarray(RNG.normal(size=grid.shape(loc)))
    want = grid_to_markers(field, x, y, grid, loc)
    got = bucket_grid_to_markers(field, bm.x, bm.y, bm.valid, grid, loc)
    fv, order_b, order_f = _bucket_to_flat_order(bm, x)
    gotv = np.asarray(got).reshape(-1)
    np.testing.assert_allclose(gotv[fv][order_b], np.asarray(want)[order_f],
                               rtol=1e-10, atol=1e-12)


def test_stretched_bucket_advect_matches_flat():
    from pylamp_tpu.markers.advect import advect_rk4
    from pylamp_tpu.markers.bucket import bucket_advect_rk4

    grid = _stretched_grid(nx=12, ny=10)
    x, y, mat, T, bm = _bucket_fixture(grid, seed=9)
    vx = jnp.asarray(RNG.normal(size=grid.shape_vx))
    vy = jnp.asarray(RNG.normal(size=grid.shape_vy))
    vmax = max(float(jnp.max(jnp.abs(vx))), float(jnp.max(jnp.abs(vy))))
    bcs = VelocityBCs()
    for stage_reach, courant in ((2, 0.9), (1, 0.45)):
        dt = courant * min(grid.dx_min, grid.dy_min) / vmax
        want_x, want_y = advect_rk4(x, y, vx, vy, dt, grid, bcs)
        out = bucket_advect_rk4(bm, vx, vy, dt, grid, bcs,
                                stage_reach=stage_reach)
        fv, order_b, order_f = _bucket_to_flat_order(bm, x)
        gx = np.asarray(out.x).reshape(-1)
        gy = np.asarray(out.y).reshape(-1)
        np.testing.assert_allclose(gx[fv][order_b],
                                   np.asarray(want_x)[order_f],
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(gy[fv][order_b],
                                   np.asarray(want_y)[order_f],
                                   rtol=1e-9, atol=1e-11)


def test_stretched_rebucket_reassigns_cells():
    from pylamp_tpu.markers.bucket import flatten, rebucket

    grid = _stretched_grid(nx=12, ny=10)
    x, y, mat, T, bm = _bucket_fixture(grid, n=500, seed=11)
    # displace by up to the SMALLEST cell size: at most one cell anywhere
    d = min(grid.dx_min, grid.dy_min)
    dxs = jnp.asarray(RNG.uniform(-d, d, bm.x.shape))
    dys = jnp.asarray(RNG.uniform(-d, d, bm.y.shape))
    moved = bm.replace(
        x=jnp.clip(bm.x + dxs * bm.valid, 1e-9, grid.lx - 1e-9),
        y=jnp.clip(bm.y + dys * bm.valid, 1e-9, grid.ly - 1e-9),
    )
    out, dropped = rebucket(moved, grid)
    assert int(dropped) == 0
    assert int(out.total()) == 500
    ox, oy, _, _, ov = (np.asarray(a) for a in flatten(out))
    ov = ov.astype(bool)
    xe, ye = grid.x_corner, grid.y_corner
    # ownership: every valid marker's position lies in its bucket cell
    cell_i = np.repeat(np.tile(np.arange(grid.nx), grid.ny), BK)
    cell_j = np.repeat(np.arange(grid.ny), grid.nx * BK)
    assert (ox[ov] >= xe[cell_i[ov]]).all()
    assert (ox[ov] <= xe[cell_i[ov] + 1]).all()
    assert (oy[ov] >= ye[cell_j[ov]]).all()
    assert (oy[ov] <= ye[cell_j[ov] + 1]).all()
    # multiset preserved
    mx = np.asarray(moved.x)[np.asarray(moved.valid)]
    np.testing.assert_allclose(np.sort(ox[ov]), np.sort(mx), rtol=1e-12)


def test_stretched_bucket_reseed_fills_cells():
    from pylamp_tpu.markers.bucket import bucket_reseed

    grid = _stretched_grid(nx=12, ny=10)
    x, y, mat, T, bm = _bucket_fixture(grid, n=400, seed=13)
    bm = bm.replace(valid=bm.valid.at[3, 4, :].set(False))
    ys = jnp.asarray(grid.y_corner)
    T_grid = jnp.broadcast_to(ys[:, None], grid.shape_corner)  # T = y
    out = bucket_reseed(bm, T_grid, grid, min_per_cell=2)
    counts = np.asarray(out.count())
    assert counts[3, 4] >= 2
    new = np.asarray(out.valid[3, 4]) & ~np.asarray(bm.valid[3, 4])
    sx = np.asarray(out.x[3, 4])[new]
    sy = np.asarray(out.y[3, 4])[new]
    Ts = np.asarray(out.T[3, 4])[new]
    xe, ye = grid.x_corner, grid.y_corner
    assert (sx > xe[4]).all() and (sx < xe[5]).all()  # inside the cell
    assert (sy > ye[3]).all() and (sy < ye[4]).all()
    np.testing.assert_allclose(Ts, sy, atol=1e-9)  # grid T at spawn points


def test_stretched_uniform_edges_bucket_step_equals_uniform_step():
    """The ENTIRE production step with the BUCKET engine on a stretched grid
    whose edges happen to be uniform == the uniform-grid bucket step (same
    hand-built marker set; Pallas kernels disabled on the stretched side by
    the uniformity gate, so this also covers the XLA fallbacks)."""
    import dataclasses as dc

    import jax

    from pylamp_tpu.markers.bucket import bucket_from_flat
    from pylamp_tpu.models.benchmarks import falling_block
    from pylamp_tpu.models.state import zero_state
    from pylamp_tpu.models.step import make_step
    from pylamp_tpu.physics.materials import MaterialTable

    base = falling_block(nx=16, ny=16, max_steps=2)
    xe = tuple(np.linspace(0.0, 1.0, 17))
    cfgs = [base, dc.replace(base, x_edges=xe, y_edges=xe)]

    results = []
    for cfg in cfgs:
        grid = StaggeredGrid(nx=cfg.nx, ny=cfg.ny, lx=cfg.lx, ly=cfg.ly,
                             x_edges=cfg.x_edges, y_edges=cfg.y_edges)
        table = MaterialTable(cfg.physics.materials)
        fm = _flat_cell_markers(grid, cfg.material_of)
        markers = bucket_from_flat(fm.x, fm.y, fm.mat, fm.T, grid, 8)
        state = zero_state(grid, markers, jnp.float64)
        state = state.replace(eta_s=jnp.ones(grid.shape_corner),
                              eta_n=jnp.ones(grid.shape_center))
        step = jax.jit(make_step(grid, cfg, table))
        for _ in range(2):
            state, diag = step(state)
        assert bool(diag["stokes_converged"])
        results.append(state)

    a, b = results
    scale = float(jnp.max(jnp.abs(a.vy)))
    assert scale > 0
    np.testing.assert_allclose(np.asarray(b.vy), np.asarray(a.vy),
                               atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(b.vx), np.asarray(a.vx),
                               atol=1e-9 * scale)
    # identical marker multiset (bucket slot ORDER may legitimately differ
    # between the two rebucket paths)
    ax = np.sort(np.asarray(a.markers.x)[np.asarray(a.markers.valid)])
    bx = np.sort(np.asarray(b.markers.x)[np.asarray(b.markers.valid)])
    np.testing.assert_allclose(bx, ax, atol=1e-12)


def test_stretched_e2e_bucket_refined_block():
    """Full build() + production step with the DEFAULT (bucket) engine on a
    genuinely stretched grid."""
    import dataclasses as dc

    import jax

    from pylamp_tpu.models.benchmarks import falling_block
    from pylamp_tpu.models.setup import build
    from pylamp_tpu.models.step import make_step
    from pylamp_tpu.markers.bucket import BucketedMarkers

    cfg = falling_block(nx=16, ny=16, max_steps=3)
    assert cfg.marker_engine == "bucket"
    cfg = dc.replace(
        cfg,
        x_edges=refined_band_edges(16, 1.0, 0.5, 0.5, 3.0),
        y_edges=refined_band_edges(16, 1.0, 0.3, 0.4, 3.0),
    )
    grid, table, state = build(cfg, dtype=jnp.float64)
    assert isinstance(state.markers, BucketedMarkers)
    step = jax.jit(make_step(grid, cfg, table))
    for _ in range(3):
        state, diag = step(state)
        assert bool(diag["stokes_converged"])
        assert int(diag["markers_dropped"]) == 0
    vy = np.asarray(state.vy)
    assert np.isfinite(vy).all()
    assert vy.max() > 0  # the dense block sinks (y points down)
    m = state.markers
    x = np.asarray(m.x)[np.asarray(m.valid)]
    y = np.asarray(m.y)[np.asarray(m.valid)]
    assert (x >= 0).all() and (x <= grid.lx).all()
    assert (y >= 0).all() and (y <= grid.ly).all()
