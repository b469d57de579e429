"""Explicit-halo production operators (parallel/halo_ops.py) vs the global
GSPMD operators: bit-level equivalence on an 8-virtual-device mesh for every
BC combination (SURVEY.md §2.3 SP row — the explicit neighbor-exchange path
promoted from the demo stencil to the production Stokes/energy applies)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.core.bc import ThermalBC, ThermalBCs, VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.energy import energy_operator
from pylamp_tpu.ops.stokes import stokes_operator
from pylamp_tpu.parallel.halo_ops import (
    energy_operator_halo,
    halo_eligible,
    stokes_operator_halo,
)
from pylamp_tpu.parallel.mesh import make_mesh


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape) * scale)


def _rand_pos(shape, seed, lo=0.5, hi=3.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, size=shape))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


VBC_CASES = [
    VelocityBCs(),  # all free slip
    VelocityBCs(top="no_slip", bottom="no_slip", left="no_slip", right="no_slip"),
    VelocityBCs(top="free_slip", bottom="no_slip", left="no_slip", right="free_slip"),
    VelocityBCs(top="no_slip", vt_top=1.5, bottom="free_slip"),  # moving wall
]


@pytest.mark.parametrize("bcs", VBC_CASES, ids=["free", "noslip", "mixed", "moving"])
def test_stokes_halo_matches_global(mesh, bcs):
    grid = StaggeredGrid(nx=32, ny=32, lx=1.0, ly=1.5)
    assert halo_eligible(grid, mesh)
    vx = _rand(grid.shape_vx, 0)
    vy = _rand(grid.shape_vy, 1)
    p = _rand(grid.shape_center, 2)
    eta_s = _rand_pos(grid.shape_corner, 3)
    eta_n = _rand_pos(grid.shape_center, 4)
    kcont, kbnd = 2.3, 4.1

    ref = stokes_operator(vx, vy, p, eta_s, eta_n, grid, bcs, kcont, kbnd)
    got = jax.jit(
        lambda *a: stokes_operator_halo(*a, grid, bcs, mesh, kcont, kbnd)
    )(vx, vy, p, eta_s, eta_n)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-12, atol=1e-11)


def test_stokes_halo_nonsquare_blocks(mesh):
    # uneven aspect: 4x2 mesh over 16x64 -> 4x32 blocks
    grid = StaggeredGrid(nx=64, ny=16, lx=2.0, ly=1.0)
    bcs = VelocityBCs(top="no_slip")
    vx = _rand(grid.shape_vx, 10)
    vy = _rand(grid.shape_vy, 11)
    p = _rand(grid.shape_center, 12)
    eta_s = _rand_pos(grid.shape_corner, 13)
    eta_n = _rand_pos(grid.shape_center, 14)
    ref = stokes_operator(vx, vy, p, eta_s, eta_n, grid, bcs, 1.0, 1.0)
    got = stokes_operator_halo(vx, vy, p, eta_s, eta_n, grid, bcs, mesh, 1.0, 1.0)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-12, atol=1e-11)


TBC_CASES = [
    ThermalBCs(),  # Dirichlet top/bottom, zero-flux sides (default)
    ThermalBCs(
        top=ThermalBC("dirichlet", 0.0),
        bottom=ThermalBC("dirichlet", 1.0),
        left=ThermalBC("dirichlet", 0.3),
        right=ThermalBC("dirichlet", 0.7),
    ),
    ThermalBCs(
        top=ThermalBC("neumann", 0.0),
        bottom=ThermalBC("neumann", 0.0),
        left=ThermalBC("neumann", 0.0),
        right=ThermalBC("neumann", 0.0),
    ),
    ThermalBCs(
        top=ThermalBC("dirichlet", 0.0),
        bottom=ThermalBC("neumann", 0.0),
        left=ThermalBC("neumann", 0.0),
        right=ThermalBC("dirichlet", 1.0),
    ),
]


@pytest.mark.parametrize("k_avg", ["arithmetic", "harmonic"])
@pytest.mark.parametrize(
    "tbcs", TBC_CASES, ids=["default", "all_dir", "all_neu", "mixed"]
)
def test_energy_halo_matches_global(mesh, tbcs, k_avg):
    grid = StaggeredGrid(nx=32, ny=16, lx=1.0, ly=0.5)
    T = _rand(grid.shape_corner, 20)
    k = _rand_pos(grid.shape_corner, 21)
    rc = _rand_pos(grid.shape_corner, 22, lo=5.0, hi=50.0)
    kbnd = 17.0
    ref = energy_operator(T, k, rc, grid, tbcs, kbnd=kbnd, k_avg=k_avg)
    got = jax.jit(
        lambda *a: energy_operator_halo(*a, grid, tbcs, mesh, kbnd=kbnd, k_avg=k_avg)
    )(T, k, rc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-11)


def test_halo_dispatch_fallback(mesh):
    # 9x9 doesn't divide over a 4x2 mesh -> operator must fall back silently
    grid = StaggeredGrid(nx=9, ny=9, lx=1.0, ly=1.0)
    assert not halo_eligible(grid, mesh)
    bcs = VelocityBCs()
    vx = _rand(grid.shape_vx, 30)
    vy = _rand(grid.shape_vy, 31)
    p = _rand(grid.shape_center, 32)
    eta_s = _rand_pos(grid.shape_corner, 33)
    eta_n = _rand_pos(grid.shape_center, 34)
    ref = stokes_operator(vx, vy, p, eta_s, eta_n, grid, bcs)
    got = stokes_operator(vx, vy, p, eta_s, eta_n, grid, bcs, halo_mesh=mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=0, atol=0)


def test_velocity_mg_halo_matches(mesh):
    """The full V-cycle preconditioner with every momentum apply routed
    through the explicit halo path must reproduce the GSPMD V-cycle."""
    from pylamp_tpu.solvers.mg import make_mg_preconditioner
    from pylamp_tpu.solvers.scaling import characteristic_viscosity, stokes_scales

    grid = StaggeredGrid(nx=32, ny=32, lx=1.0, ly=1.0)
    eta_s = _rand_pos(grid.shape_corner, 40, lo=0.1, hi=10.0)
    eta_n = _rand_pos(grid.shape_center, 41, lo=0.1, hi=10.0)
    bcs = VelocityBCs(top="no_slip")
    kcont, kbnd = stokes_scales(characteristic_viscosity(eta_n), grid)

    r = (
        _rand(grid.shape_vx, 42),
        _rand(grid.shape_vy, 43),
        _rand(grid.shape_center, 44),
    )
    M_ref = make_mg_preconditioner(eta_s, eta_n, grid, kcont, kbnd, bcs=bcs)
    M_halo = make_mg_preconditioner(
        eta_s, eta_n, grid, kcont, kbnd, bcs=bcs, halo_mesh=mesh
    )
    z_ref = jax.jit(M_ref)(r)
    z_halo = jax.jit(M_halo)(r)
    for a, b in zip(z_ref, z_halo):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10, atol=1e-12)


def test_energy_mg_halo_matches(mesh):
    from pylamp_tpu.solvers.energy_mg import make_energy_mg_preconditioner

    grid = StaggeredGrid(nx=32, ny=32, lx=1.0, ly=1.0)
    k = _rand_pos(grid.shape_corner, 50)
    rc = _rand_pos(grid.shape_corner, 51, lo=5.0, hi=20.0)
    tbcs = ThermalBCs()
    M_ref = make_energy_mg_preconditioner(k, rc, grid, tbcs, 13.0)
    M_halo = make_energy_mg_preconditioner(k, rc, grid, tbcs, 13.0, halo_mesh=mesh)
    r = _rand(grid.shape_corner, 52)
    np.testing.assert_allclose(
        np.asarray(jax.jit(M_halo)(r)),
        np.asarray(jax.jit(M_ref)(r)),
        rtol=1e-10,
        atol=1e-12,
    )


@pytest.mark.slow
def test_explicit_halo_step_matches_single_device(mesh):
    """Whole production step with explicit_halo=True on the 8-device mesh
    vs the single-device step (the SP-analogue equivalence bar of
    SURVEY.md §4 'Distributed')."""
    import dataclasses

    from pylamp_tpu.models.benchmarks import falling_block
    from pylamp_tpu.models.config import SolverConfig
    from pylamp_tpu.models.setup import build
    from pylamp_tpu.models.step import make_step
    from pylamp_tpu.parallel.mesh import shard_state, state_shardings

    cfg = falling_block(nx=32, ny=32, max_steps=2)
    cfg = dataclasses.replace(
        cfg,
        solver=SolverConfig(precision="f64", stokes_tol=1e-10,
                            stokes_restart=40, stokes_maxiter=400,
                            explicit_halo=True),
    )
    grid, table, state0 = build(cfg)

    s1, d1 = jax.jit(make_step(grid, cfg, table))(state0)

    step = make_step(grid, cfg, table, mesh=mesh)
    sharded = shard_state(state0, mesh)
    shardings = state_shardings(mesh, state0)
    s8, d8 = jax.jit(step, in_shardings=(shardings,))(sharded)

    assert bool(d8["stokes_converged"])
    vref = float(jnp.max(jnp.abs(s1.vy)))
    tol = 1e-8
    np.testing.assert_allclose(np.asarray(s8.vx), np.asarray(s1.vx), atol=tol * max(vref, 1))
    np.testing.assert_allclose(np.asarray(s8.vy), np.asarray(s1.vy), atol=tol * max(vref, 1))
    np.testing.assert_allclose(np.asarray(s8.T), np.asarray(s1.T), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(s8.markers.y), np.asarray(s1.markers.y), atol=1e-9
    )


def test_energy_halo_periodic_matches_global(mesh):
    """Periodic side walls through the explicit-halo energy operator
    (round-4 verdict item 6): ring exchange + half-convention seam
    columns, including the bottom-row and corner seam outputs."""
    grid = StaggeredGrid(nx=32, ny=16, lx=1.0, ly=0.5)
    tbcs = ThermalBCs(
        top=ThermalBC("dirichlet", 0.0),
        bottom=ThermalBC("dirichlet", 1.0),
        left=ThermalBC("periodic", 0.0),
        right=ThermalBC("periodic", 0.0),
    )
    for k_avg in ("arithmetic", "harmonic"):
        T = _rand(grid.shape_corner, 31)
        k = _rand_pos(grid.shape_corner, 32)
        rc = _rand_pos(grid.shape_corner, 33, lo=5.0, hi=50.0)
        kbnd = 9.0
        ref = energy_operator(T, k, rc, grid, tbcs, kbnd=kbnd, k_avg=k_avg)
        got = jax.jit(
            lambda *a, ka=k_avg: energy_operator_halo(
                *a, grid, tbcs, mesh, kbnd=kbnd, k_avg=ka)
        )(T, k, rc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-11)
