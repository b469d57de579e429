"""Periodic lateral BCs — whole production step, end to end.

The strongest periodic check: exact discrete translation invariance of the
FULL step (interp -> Stokes -> dt -> energy -> advect -> rebucket).  The
marker set is built per-cell-deterministic so rolling the material pattern
by k cells is an exact symmetry of the discrete problem; every output must
roll accordingly (up to Krylov roundoff).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.bucket import BucketedMarkers
from pylamp_tpu.models.benchmarks import falling_block_periodic
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.state import zero_state
from pylamp_tpu.models.step import make_step


def _cell_markers(grid, material_pattern, dtype=jnp.float64, per_cell=4, K=8):
    """Per-cell deterministic marker set: slot s of EVERY cell sits at the
    same sub-cell offset, so an integer-cell roll of the material pattern is
    an exact translation of the marker set."""
    ny, nx = grid.ny, grid.nx
    offs = [(0.25, 0.25), (0.75, 0.25), (0.25, 0.75), (0.75, 0.75)]
    x = np.zeros((ny, nx, K))
    y = np.zeros((ny, nx, K))
    valid = np.zeros((ny, nx, K), bool)
    for s, (ox, oy) in enumerate(offs[:per_cell]):
        x[:, :, s] = (np.arange(nx)[None, :] + ox) * grid.dx
        y[:, :, s] = (np.arange(ny)[:, None] + oy) * grid.dy
        valid[:, :, s] = True
    mat = np.where(valid, material_pattern[:, :, None], 0).astype(np.int32)
    T = np.zeros((ny, nx, K))
    return BucketedMarkers(
        x=jnp.asarray(x, dtype), y=jnp.asarray(y, dtype),
        mat=jnp.asarray(mat), T=jnp.asarray(T, dtype),
        valid=jnp.asarray(valid),
    )


def test_periodic_step_translation_invariance():
    cfg = falling_block_periodic(nx=16, ny=16, max_steps=2)
    cfg = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(cfg.solver, stokes_tol=1e-10,
                                   stokes_maxiter=600),
    )
    grid = StaggeredGrid(nx=cfg.nx, ny=cfg.ny, lx=cfg.lx, ly=cfg.ly)
    from pylamp_tpu.physics.materials import MaterialTable

    table = MaterialTable(cfg.physics.materials)
    step = jax.jit(make_step(grid, cfg, table))

    # block pattern straddling the seam (cells 0..1 and nx-2..nx-1)
    pat = np.zeros((grid.ny, grid.nx), np.int32)
    pat[6:10, :2] = 1
    pat[6:10, -2:] = 1
    k = 5

    def run(pattern):
        m = _cell_markers(grid, pattern)
        state = zero_state(grid, m, jnp.float64)
        eta = jnp.ones(grid.shape_corner, jnp.float64)
        state = state.replace(eta_s=eta, eta_n=jnp.ones(grid.shape_center))
        for _ in range(2):
            state, diag = step(state)
        assert bool(diag["stokes_converged"])
        assert int(diag["markers_dropped"]) == 0
        return state

    s0 = run(pat)
    s1 = run(np.roll(pat, k, axis=1))

    scale = float(jnp.max(jnp.abs(s0.vy)))
    assert scale > 0
    np.testing.assert_allclose(
        np.asarray(s1.vy), np.roll(np.asarray(s0.vy), k, axis=1),
        atol=1e-8 * scale,
    )
    np.testing.assert_allclose(
        np.asarray(s1.vx)[:, :-1],
        np.roll(np.asarray(s0.vx)[:, :-1], k, axis=1),
        atol=1e-8 * scale,
    )
    np.testing.assert_allclose(
        np.asarray(s1.p), np.roll(np.asarray(s0.p), k, axis=1),
        atol=1e-7 * float(jnp.max(jnp.abs(s0.p))),
    )
    # marker positions roll by exactly k*dx (mod lx)
    m0, m1 = s0.markers, s1.markers
    x0 = np.sort(np.asarray(m0.x)[np.asarray(m0.valid)])
    x1 = np.sort(np.asarray(m1.x)[np.asarray(m1.valid)])
    x0_rolled = np.sort((x0 + k * grid.dx) % grid.lx)
    np.testing.assert_allclose(x1, x0_rolled, atol=1e-10 * grid.lx)


def test_falling_block_periodic_benchmark_runs():
    """The registered config end-to-end via build(): the seam-straddling
    block sinks coherently (fastest flow at the seam columns), every step
    converges, no markers dropped."""
    cfg = falling_block_periodic(nx=32, ny=32, max_steps=3)
    grid, table, state = build(cfg, dtype=jnp.float64)
    step = jax.jit(make_step(grid, cfg, table))
    for _ in range(3):
        state, diag = step(state)
        assert bool(diag["stokes_converged"])
        assert int(diag["markers_dropped"]) == 0
    vy = np.asarray(state.vy)
    # downward (positive) flow is strongest near the seam where the block is
    peak_col = np.unravel_index(np.argmax(vy), vy.shape)[1]
    assert peak_col <= 3 or peak_col >= grid.nx - 4, peak_col
    # and the solution is seam-consistent on the duplicated lattices
    np.testing.assert_allclose(
        np.asarray(state.vx)[:, 0], np.asarray(state.vx)[:, -1],
        atol=1e-12 * max(1e-30, float(np.max(np.abs(state.vx)))),
    )
