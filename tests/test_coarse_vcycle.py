"""Fused coarse sub-V-cycle (ops/pallas/coarse_vcycle_kernel.py) vs the
jnp V-cycle — interpret mode on CPU, fp32 tolerance (round-4 verdict item
4: the dispatch-bound coarse levels run as ONE pallas_call)."""
import jax.numpy as jnp
import numpy as np
import pytest

import pylamp_tpu.ops.pallas.coarse_vcycle_kernel as cvk
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.solvers.mg import make_velocity_mg


def _problem(n=64, seed=9):
    grid = StaggeredGrid(nx=n, ny=n, lx=1.0, ly=1.0)
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    es = jnp.asarray(np.exp(2 * rng.standard_normal(grid.shape_corner)), f32)
    en = jnp.asarray(np.exp(2 * rng.standard_normal(grid.shape_center)), f32)
    rx = jnp.asarray(rng.standard_normal(grid.shape_vx), f32)
    ry = jnp.asarray(rng.standard_normal(grid.shape_vy), f32)
    return grid, es, en, rx, ry


@pytest.mark.parametrize("bc", ["free_slip", "no_slip"])
def test_fused_coarse_vcycle_matches_jnp(monkeypatch, bc):
    calls = {"n": 0}
    orig = cvk.coarse_vcycle_pallas

    def counting(rx, ry, prep, interpret=False):
        calls["n"] += 1
        return orig(rx, ry, prep, interpret=interpret)

    monkeypatch.setattr(cvk, "coarse_vcycle_pallas", counting)

    bcs = VelocityBCs(top=bc, bottom=bc, left=bc, right=bc)
    grid, es, en, rx, ry = _problem()
    kbnd = 3.0

    # fusion starts below the 256 cutoff -> level 1 (32^2) on a 64^2 grid
    mg_ref = make_velocity_mg(es, en, grid, bcs, kbnd,
                              use_pallas_smoother=False)
    mg_fused = make_velocity_mg(es, en, grid, bcs, kbnd,
                                use_pallas_smoother=True,
                                pallas_interpret=True)
    zx_r, zy_r = mg_ref(rx, ry)
    zx_f, zy_f = mg_fused(rx, ry)
    assert calls["n"] >= 1, "fused coarse V-cycle was not dispatched"

    sx = float(jnp.max(jnp.abs(zx_r)))
    sy = float(jnp.max(jnp.abs(zy_r)))
    # identical math modulo matmul-reassociated transfers: fp32 tolerance
    np.testing.assert_allclose(np.asarray(zx_f), np.asarray(zx_r),
                               atol=2e-5 * sx)
    np.testing.assert_allclose(np.asarray(zy_f), np.asarray(zy_r),
                               atol=2e-5 * sy)


def test_fuse_start_gates():
    from pylamp_tpu.solvers.mg import coarsening_plan

    grid = StaggeredGrid(nx=64, ny=64, lx=1.0, ly=1.0)
    plan = coarsening_plan(grid, 0)
    grids = [grid]
    for cx, cy in plan:
        grids.append(grids[-1].coarsen(cx, cy))
    bcs = VelocityBCs()
    fs = cvk.coarse_fuse_start(grids, plan, bcs, jnp.float32, "chebyshev",
                               False, False)
    assert fs is not None and max(grids[fs].ny, grids[fs].nx) < 256
    # gates: dtype, smoother, options, periodic
    assert cvk.coarse_fuse_start(grids, plan, bcs, jnp.float64,
                                 "chebyshev", False, False) is None
    assert cvk.coarse_fuse_start(grids, plan, bcs, jnp.float32,
                                 "jacobi", False, False) is None
    assert cvk.coarse_fuse_start(grids, plan, bcs, jnp.float32,
                                 "chebyshev", True, False) is None
    per = VelocityBCs(left="periodic", right="periodic")
    assert cvk.coarse_fuse_start(grids, plan, per, jnp.float32,
                                 "chebyshev", False, False) is None
