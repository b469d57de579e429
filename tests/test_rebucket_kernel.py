"""The Pallas rebucket kernel must repack bit-identically to the XLA
one-hot loop (same insertion order, same overflow-drop rule).

Interpret-mode execution of the kernel's VMEM read-modify-write loop is
slow (minutes at production K), so these tests run tiny K on the slow
tier; the production-shape equivalence (bit-identical at 1024x1024x16 and
256x1024x16, 4.1x faster) was verified on a real v5e chip.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.bucket import BucketedMarkers, rebucket
from pylamp_tpu.markers.pallas.rebucket_kernel import rebucket_pallas


def _random_bm(ny, nx, K, fill=0.7, seed=0):
    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.0, ly=1.0)
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    ci = jnp.arange(nx)[None, :, None]
    cj = jnp.arange(ny)[:, None, None]
    jx = jax.random.uniform(ks[0], (ny, nx, K), minval=-0.999, maxval=1.999)
    jy = jax.random.uniform(ks[1], (ny, nx, K), minval=-0.999, maxval=1.999)
    x = jnp.clip((ci + jx) * grid.dx, 1e-9, grid.lx - 1e-9).astype(jnp.float32)
    y = jnp.clip((cj + jy) * grid.dy, 1e-9, grid.ly - 1e-9).astype(jnp.float32)
    T = jax.random.normal(ks[2], (ny, nx, K), jnp.float32)
    mat = jax.random.randint(ks[3], (ny, nx, K), 0, 5)
    valid = jax.random.uniform(ks[4], (ny, nx, K)) < fill
    return BucketedMarkers(x=x, y=y, mat=mat, T=T, valid=valid), grid


@pytest.mark.slow
def test_rebucket_kernel_matches_xla_interpret():
    bm, grid = _random_bm(8, 128, 3)
    a, da = rebucket(bm, grid)
    b, db = rebucket_pallas(bm, grid, interpret=True)
    assert int(da) == int(db)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    for f in ("x", "y", "T", "mat"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        )


@pytest.mark.slow
def test_rebucket_kernel_overflow_drops_match():
    # NOTE: shapes deliberately match the test above — running two
    # different-shaped pallas interpret calls in one process aborts
    # natively (jax interpret-mode bug, reproduced at (16,128,6)+(8,128,4))
    bm, grid = _random_bm(8, 128, 3, fill=1.0, seed=3)
    a, da = rebucket(bm, grid)
    b, db = rebucket_pallas(bm, grid, interpret=True)
    assert int(da) == int(db)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))


@pytest.mark.slow
def test_rebucket_kernel_periodic_matches_xla():
    """Periodic sides: the kernel's wrapped lane-rotate must repack
    seam-crossing markers bit-identically to the XLA wrapped repack."""
    bm, grid = _random_bm(8, 128, 3, seed=9)
    # push seam-column markers across the seam (wrapped positions)
    x = bm.x
    shove = (jnp.arange(128)[None, :, None] == 0) & bm.valid
    x = jnp.where(shove, (x - 1.5 * grid.dx) % grid.lx, x)
    shove_r = (jnp.arange(128)[None, :, None] == 127) & bm.valid
    x = jnp.where(shove_r, (x + 1.5 * grid.dx) % grid.lx, x)
    bm = bm.replace(x=x)
    a, da = rebucket(bm, grid, periodic_x=True)
    b, db = rebucket_pallas(bm, grid, interpret=True, periodic_x=True)
    assert int(da) == int(db)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    for f in ("x", "y", "T", "mat"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        )
