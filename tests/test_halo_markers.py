"""Explicit-halo marker engine (parallel/halo_markers.py) vs the global
bucketed engine: equivalence on an 8-virtual-device mesh for every marker
operation — m2g on all four staggered lattices / all averaging modes, g2m at
both reaches, RK4 advection with BC ghosts, re-bucketing (bit-identical slot
assignment), and reseed majority voting.  Completes the SP-analogue coverage
started in tests/test_halo_ops.py (SURVEY.md §2.3)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.bucket import (
    bucket_advect_rk4,
    bucket_from_flat,
    bucket_grid_to_markers,
    bucket_markers_to_grid,
    bucket_reseed,
    rebucket,
)
from pylamp_tpu.parallel.halo_markers import (
    advect_rk4_halo,
    g2m_halo,
    halo_markers_eligible,
    m2g_halo,
    rebucket_halo,
    reseed_halo,
)
from pylamp_tpu.parallel.mesh import make_mesh

GRID = StaggeredGrid(nx=16, ny=16, lx=1.2, ly=1.0)
K = 10


@pytest.fixture(scope="module")
def mesh():
    m = make_mesh(8)
    assert halo_markers_eligible(GRID, m)
    return m


def _markers(n=1500, seed=3, grid=GRID):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(1e-6, grid.lx - 1e-6, n))
    y = jnp.asarray(rng.uniform(1e-6, grid.ly - 1e-6, n))
    mat = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
    T = jnp.asarray(np.exp(rng.normal(size=n)))  # positive (geometric mode)
    return bucket_from_flat(x, y, mat, T, grid, K)


def _field(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape))


@pytest.mark.parametrize("loc", ["corner", "center", "vx", "vy"])
@pytest.mark.parametrize("mode", ["arithmetic", "geometric", "harmonic"])
@pytest.mark.slow
def test_m2g_halo_matches_global(mesh, loc, mode):
    bm = _markers()
    vals = bm.T
    ref_f, ref_w = bucket_markers_to_grid(bm, vals, GRID, loc, mode)
    got_f, got_w = jax.jit(
        lambda b, v: m2g_halo(b, v, GRID, loc, mode, mesh)
    )(bm, vals)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(got_f), np.asarray(ref_f), rtol=1e-11, atol=1e-13
    )


@pytest.mark.parametrize("loc", ["corner", "center", "vx", "vy"])
@pytest.mark.parametrize("reach", [1, 2])
@pytest.mark.slow
def test_g2m_halo_matches_global(mesh, loc, reach):
    bm = _markers(seed=7)
    field = _field(GRID.shape(loc), 11)
    ref = bucket_grid_to_markers(
        field, bm.x, bm.y, bm.valid, GRID, loc, reach=reach
    )
    got = jax.jit(
        lambda f, b: g2m_halo(f, b.x, b.y, b.valid, GRID, loc, mesh, reach=reach)
    )(field, bm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-14)


VBC_CASES = [
    VelocityBCs(),
    VelocityBCs(top="no_slip", bottom="no_slip", left="no_slip", right="no_slip"),
    VelocityBCs(top="no_slip", vt_top=0.8, bottom="free_slip"),
]


@pytest.mark.parametrize("bcs", VBC_CASES, ids=["free", "noslip", "moving"])
@pytest.mark.parametrize("stage_reach", [1, 2])
@pytest.mark.slow
def test_advect_halo_matches_global(mesh, bcs, stage_reach):
    bm = _markers(seed=13)
    vx = _field(GRID.shape_vx, 21) * 0.1
    vy = _field(GRID.shape_vy, 22) * 0.1
    # dt small enough that stage displacements stay within stage_reach cells
    dt = 0.2 * min(GRID.dx, GRID.dy) / 0.4
    ref = bucket_advect_rk4(bm, vx, vy, dt, GRID, bcs, stage_reach=stage_reach)
    got = jax.jit(
        lambda b, u, v: advect_rk4_halo(
            b, u, v, dt, GRID, bcs, mesh, stage_reach=stage_reach
        )
    )(bm, vx, vy)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(ref.y), rtol=1e-12)


def test_rebucket_halo_bit_identical(mesh):
    bm = _markers(seed=17)
    # displace every marker by up to one cell so rebucketing actually moves
    rng = np.random.default_rng(19)
    ddx = jnp.asarray(rng.uniform(-1, 1, bm.x.shape)) * GRID.dx
    ddy = jnp.asarray(rng.uniform(-1, 1, bm.y.shape)) * GRID.dy
    bm = bm.replace(
        x=jnp.clip(bm.x + ddx, 1e-9, GRID.lx - 1e-9),
        y=jnp.clip(bm.y + ddy, 1e-9, GRID.ly - 1e-9),
    )
    ref, ref_drop = rebucket(bm, GRID)
    got, got_drop = jax.jit(lambda b: rebucket_halo(b, GRID, mesh))(bm)
    assert int(got_drop) == int(ref_drop)
    for f in ("x", "y", "T"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
        )
    np.testing.assert_array_equal(np.asarray(got.mat), np.asarray(ref.mat))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))


def test_reseed_halo_matches_global(mesh):
    # sparse seeding so plenty of cells are starved
    bm = _markers(n=250, seed=23)
    T_grid = _field(GRID.shape_corner, 29)
    ref = bucket_reseed(bm, T_grid, GRID, min_per_cell=4, n_materials=3)
    got = jax.jit(
        lambda b, t: reseed_halo(b, t, GRID, 4, 3, mesh)
    )(bm, T_grid)
    np.testing.assert_array_equal(np.asarray(got.mat), np.asarray(ref.mat))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.T), np.asarray(ref.T), rtol=1e-11, atol=1e-13)


@pytest.mark.slow
def test_whole_step_halo_markers_matches_single_device():
    """make_step with mesh + explicit_halo (which now routes the marker
    engine through halo_markers) vs the single-device step."""
    from pylamp_tpu.models.benchmarks import falling_block
    from pylamp_tpu.models.config import SolverConfig
    from pylamp_tpu.models.setup import build
    from pylamp_tpu.models.step import make_step
    from pylamp_tpu.parallel.mesh import shard_state

    cfg = falling_block(nx=16, ny=16)
    cfg = dataclasses.replace(
        cfg,
        physics=dataclasses.replace(cfg.physics, reseed_min_per_cell=3),
        solver=SolverConfig(stokes_tol=1e-10, explicit_halo=True),
    )
    grid, table, state = build(cfg, dtype=jnp.float64)

    step1 = jax.jit(make_step(grid, cfg, table))
    sref = state
    for _ in range(2):
        sref, _ = step1(sref)

    mesh = make_mesh(8)
    sharded = shard_state(state, mesh)
    stepn = jax.jit(make_step(grid, cfg, table, mesh=mesh))
    for _ in range(2):
        sharded, _ = stepn(sharded)

    np.testing.assert_allclose(
        np.asarray(sharded.vx), np.asarray(sref.vx), rtol=0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sharded.T), np.asarray(sref.T), rtol=0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sharded.markers.x), np.asarray(sref.markers.x),
        rtol=0, atol=1e-10,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.markers.valid), np.asarray(sref.markers.valid)
    )
