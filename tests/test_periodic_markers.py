"""Periodic lateral BCs — marker engine (bucket + flat) wrap-around.

The bucket engine expresses the wrap as x-rolled dense shifts; the flat
engine wraps scatter/gather indices mod nx.  The two engines must agree,
and the seam must be invisible: uniform fields interpolate exactly,
advection through the seam preserves the marker set, and everything is
translation-invariant in x.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.markers.bucket import (
    bucket_advect_rk4,
    bucket_from_flat,
    bucket_grid_to_markers,
    bucket_markers_to_grid,
    bucket_reseed,
    flatten,
    rebucket,
)
from pylamp_tpu.markers.advect import advect_rk4
from pylamp_tpu.markers.interp import grid_to_markers, markers_to_grid

GRID = StaggeredGrid(nx=12, ny=10, lx=1.2, ly=1.0)
K = 48  # seam-biased marker sets pack ~30 markers/cell near the seam
BCS = VelocityBCs(left="periodic", right="periodic")


def _random_markers(n=700, seed=5):
    rng = np.random.default_rng(seed)
    # bias markers toward the seam so the wrap paths are exercised hard
    u = rng.uniform(0.0, 1.0, n)
    x = jnp.asarray(np.where(u < 0.5, u * 0.1, 1.0 - (u - 0.5) * 0.1) * GRID.lx)
    y = jnp.asarray(rng.uniform(1e-6, GRID.ly - 1e-6, n))
    mat = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
    T = jnp.asarray(np.exp(rng.normal(size=n)))
    return x, y, mat, T


def _dup(field_u):
    return np.concatenate([field_u, field_u[:, :1]], axis=1)


@pytest.mark.parametrize("loc", ["corner", "center", "vx", "vy"])
@pytest.mark.parametrize("mode", ["arithmetic", "geometric"])
def test_periodic_bucket_m2g_matches_flat(loc, mode):
    x, y, mat, T = _random_markers()
    bm = bucket_from_flat(x, y, mat, T, GRID, K)
    vals = jnp.where(bm.valid, jnp.exp(jnp.sin(bm.x * 7) + jnp.cos(bm.y * 5)), 1.0)
    flat_vals = jnp.exp(jnp.sin(x * 7) + jnp.cos(y * 5))

    got, gw = bucket_markers_to_grid(bm, vals, GRID, loc, mode, periodic_x=True)
    want, ww = markers_to_grid(x, y, flat_vals, GRID, loc, mode, periodic_x=True)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ww), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("loc", ["corner", "center", "vx", "vy"])
def test_periodic_m2g_uniform_is_exact(loc):
    """Partition of unity across the seam: a uniform marker value
    interpolates to exactly that value at EVERY node with weight > 0,
    including the seam columns."""
    x, y, mat, T = _random_markers(n=GRID.nx * GRID.ny * 8, seed=3)
    bm = bucket_from_flat(x, y, mat, T, GRID, K)
    vals = jnp.where(bm.valid, 3.7, 1.0)
    field, w = bucket_markers_to_grid(bm, vals, GRID, loc, periodic_x=True)
    f = np.asarray(field)
    np.testing.assert_allclose(f[np.asarray(w) > 0], 3.7, rtol=1e-12)
    if f.shape[1] == GRID.nx + 1:
        np.testing.assert_allclose(f[:, 0], f[:, -1], rtol=1e-13)


@pytest.mark.parametrize("loc", ["corner", "center", "vx", "vy"])
def test_periodic_bucket_g2m_matches_flat(loc):
    x, y, mat, T = _random_markers()
    bm = bucket_from_flat(x, y, mat, T, GRID, K)
    rng = np.random.default_rng(17)
    fu = rng.normal(size=(GRID.shape(loc)[0], GRID.nx))
    field = fu if GRID.shape(loc)[1] == GRID.nx else _dup(fu)

    got = bucket_grid_to_markers(
        jnp.asarray(field), bm.x, bm.y, bm.valid, GRID, loc, periodic_x=True
    )
    want = grid_to_markers(jnp.asarray(field), x, y, GRID, loc, periodic_x=True)
    # compare as multisets keyed by position
    fx, fy, _, _, fv = (np.asarray(a) for a in flatten(bm))
    gv = np.asarray(got).reshape(-1)[fv.astype(bool)]
    keys = np.round(fx[fv.astype(bool)] * 1e9).astype(np.int64)
    order_b = np.argsort(keys)
    keys_f = np.round(np.asarray(x) * 1e9).astype(np.int64)
    order_f = np.argsort(keys_f)
    np.testing.assert_allclose(gv[order_b], np.asarray(want)[order_f],
                               rtol=1e-10, atol=1e-12)


def test_periodic_advect_through_seam():
    """Uniform vx translates every marker by exactly c*dt (mod lx); markers
    crossing the seam wrap and rebucket into the opposite edge column with
    nothing dropped."""
    x, y, mat, T = _random_markers(n=500, seed=11)
    bm = bucket_from_flat(x, y, mat, T, GRID, K)
    n0 = int(bm.total())
    c = 0.9 * GRID.dx  # per unit time
    vx = jnp.full(GRID.shape_vx, c)
    vy = jnp.zeros(GRID.shape_vy)
    dt = 1.0

    bm2 = bucket_advect_rk4(bm, vx, vy, dt, GRID, BCS, stage_reach=2)
    bm2, dropped = rebucket(bm2, GRID, periodic_x=True)
    assert int(dropped) == 0
    assert int(bm2.total()) == n0

    fx2, fy2, _, _, fv2 = (np.asarray(a) for a in flatten(bm2))
    got = np.sort(fx2[fv2.astype(bool)])
    want = np.sort(np.asarray((x + c * dt) % GRID.lx))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # y untouched by the uniform horizontal flow
    np.testing.assert_allclose(
        np.sort(fy2[fv2.astype(bool)]), np.sort(np.asarray(y)), rtol=1e-12
    )
    # rebucket placed every marker in its owning column
    ci = np.floor(fx2[fv2.astype(bool)] / GRID.dx).astype(int)
    j, i, _ = np.nonzero(np.asarray(bm2.valid))
    assert set(ci) == set(np.floor(fx2[fv2.astype(bool)] / GRID.dx).astype(int))
    np.testing.assert_array_equal(
        np.sort(i), np.sort(np.clip(ci, 0, GRID.nx - 1))
    )


def test_periodic_advect_matches_flat():
    """Bucket RK4 == flat RK4 under a periodic velocity field with flow
    through the seam."""
    x, y, mat, T = _random_markers(n=400, seed=23)
    bm = bucket_from_flat(x, y, mat, T, GRID, K)
    yv, xv = GRID.coords("vx")
    Xv = np.meshgrid(xv, yv)[0]
    vx = jnp.asarray(0.3 * GRID.dx * (1.5 + np.sin(2 * np.pi * Xv / GRID.lx)))
    yw, xw = GRID.coords("vy")
    Xw, Yw = np.meshgrid(xw, yw)
    vy = jnp.asarray(
        0.2 * GRID.dy * np.cos(2 * np.pi * Xw / GRID.lx) * np.sin(np.pi * Yw / GRID.ly)
    )
    vy = vy.at[0, :].set(0.0).at[-1, :].set(0.0)
    dt = 1.0

    bm2 = bucket_advect_rk4(bm, vx, vy, dt, GRID, BCS, stage_reach=2)
    px_f, py_f = advect_rk4(x, y, vx, vy, dt, GRID, BCS)

    fx2, fy2, _, _, fv2 = (np.asarray(a) for a in flatten(bm2))
    sel = fv2.astype(bool)
    np.testing.assert_allclose(
        np.sort(fx2[sel]), np.sort(np.asarray(px_f)), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.sort(fy2[sel]), np.sort(np.asarray(py_f)), rtol=1e-10, atol=1e-12
    )


def test_periodic_reseed_wraps_majority():
    """A starved column at the seam reseeds with the majority material of
    its WRAPPED 3x3 neighborhood."""
    nx, ny = GRID.nx, GRID.ny
    rng = np.random.default_rng(31)
    # markers everywhere except column 0; all material 2 in columns nx-1/1
    xs, ys, ms = [], [], []
    for i in range(1, nx):
        for j in range(ny):
            for s in range(4):
                xs.append((i + 0.2 + 0.2 * s) * GRID.dx)
                ys.append((j + 0.25 + 0.15 * s) * GRID.dy)
                ms.append(2 if i in (1, nx - 1) else 0)
    x = jnp.asarray(xs)
    y = jnp.asarray(ys)
    mat = jnp.asarray(ms, jnp.int32)
    T = jnp.zeros_like(x)
    bm = bucket_from_flat(x, y, mat, T, GRID, K)
    T_grid = jnp.zeros(GRID.shape_corner)

    out = bucket_reseed(bm, T_grid, GRID, min_per_cell=2, n_materials=3,
                        periodic_x=True)
    newly = np.asarray(out.valid) & ~np.asarray(bm.valid)
    j, i, s = np.nonzero(newly)
    assert (i == 0).all() and len(j) == 2 * ny  # only column 0 was starved
    # wrapped neighborhood of column 0 = columns {nx-1, 0, 1}: all mat 2
    np.testing.assert_array_equal(np.asarray(out.mat)[newly], 2)
