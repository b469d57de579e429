"""The fused Pallas RK4 kernel must match the XLA bucketed RK4
(markers/bucket.py `bucket_advect_rk4`) to f32 summation-order tolerance.

Interpret mode on CPU, tiny K (slow tier); production shapes A/B'd on a
real v5e chip.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.bucket import BucketedMarkers, bucket_advect_rk4
from pylamp_tpu.markers.pallas.advect_kernel import advect_rk4_pallas


def _setup(ny=8, nx=128, K=3, seed=0):
    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.0, ly=0.5)
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    ci = jnp.arange(nx)[None, :, None]
    cj = jnp.arange(ny)[:, None, None]
    jx = jax.random.uniform(ks[0], (ny, nx, K), minval=0.001, maxval=0.999)
    jy = jax.random.uniform(ks[1], (ny, nx, K), minval=0.001, maxval=0.999)
    x = ((ci + jx) * grid.dx).astype(jnp.float32)
    y = ((cj + jy) * grid.dy).astype(jnp.float32)
    T = jnp.zeros((ny, nx, K), jnp.float32)
    mat = jnp.zeros((ny, nx, K), jnp.int32)
    valid = jax.random.uniform(ks[2], (ny, nx, K)) < 0.8
    bm = BucketedMarkers(x=x, y=y, mat=mat, T=T, valid=valid)
    vx = jax.random.normal(ks[3], (ny, nx + 1), jnp.float32)
    vy = jax.random.normal(ks[4], (ny + 1, nx), jnp.float32)
    # dt such that max displacement stays within ~0.4 cells (reach 1)
    vmax = float(jnp.maximum(jnp.max(jnp.abs(vx)), jnp.max(jnp.abs(vy))))
    dt = 0.4 * min(grid.dx, grid.dy) / vmax
    return bm, grid, vx, vy, jnp.float32(dt)


def _close(a, b, tol=5e-6):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.max(np.abs(b)), 1e-300)
    return np.max(np.abs(a - b)) / scale < tol


@pytest.mark.slow
@pytest.mark.parametrize("bckind", ["free_slip", "no_slip"])
def test_advect_kernel_matches_xla(bckind):
    bm, grid, vx, vy, dt = _setup()
    bcs = VelocityBCs(top=bckind, bottom=bckind, left=bckind, right=bckind)
    a = bucket_advect_rk4(bm, vx, vy, dt, grid, bcs, stage_reach=1)
    b = advect_rk4_pallas(bm, vx, vy, dt, grid, bcs, stage_reach=1,
                          interpret=True)
    assert _close(b.x, a.x)
    assert _close(b.y, a.y)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


@pytest.mark.slow
def test_advect_kernel_reach2():
    bm, grid, vx, vy, dt = _setup(seed=5)
    bcs = VelocityBCs()
    # double dt: displacements near one full cell -> needs reach 2
    a = bucket_advect_rk4(bm, vx, vy, 2.0 * dt, grid, bcs, stage_reach=2)
    b = advect_rk4_pallas(bm, vx, vy, 2.0 * dt, grid, bcs, stage_reach=2,
                          interpret=True)
    assert _close(b.x, a.x)
    assert _close(b.y, a.y)


@pytest.mark.slow
def test_advect_kernel_slot_chunked_bit_identical():
    """Slot-chunked dispatch (oversized-shape fallback, e.g. 2048^2 x K18)
    must be BIT-identical to the single-call kernel: each marker's
    integration is independent of the slot axis."""
    bm, grid, vx, vy, dt = _setup(K=5, seed=7)
    bcs = VelocityBCs()
    a = advect_rk4_pallas(bm, vx, vy, dt, grid, bcs, stage_reach=1,
                          interpret=True)
    b = advect_rk4_pallas(bm, vx, vy, dt, grid, bcs, stage_reach=1,
                          interpret=True, slot_chunk=2)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))


@pytest.mark.slow
def test_advect_kernel_periodic_matches_xla():
    """Periodic sides: wrapped velocity sampling + position wrap must
    match the XLA bucketed RK4 (seam-crossing trajectories included)."""
    bm, grid, vx, vy, _ = _setup(seed=11)
    # seam-consistent vx (duplicated seam columns are one physical node)
    # plus a uniform rightward drift so seam markers actually cross
    vx = vx * 0.3 + 1.0
    vx = vx.at[:, -1].set(vx[:, 0])
    vmax = float(jnp.maximum(jnp.max(jnp.abs(vx)), jnp.max(jnp.abs(vy))))
    dt = jnp.float32(0.4 * min(grid.dx, grid.dy) / vmax)
    bcs = VelocityBCs(left="periodic", right="periodic")
    a = bucket_advect_rk4(bm, vx, vy, dt, grid, bcs, stage_reach=1)
    b = advect_rk4_pallas(bm, vx, vy, dt, grid, bcs, stage_reach=1,
                          interpret=True)
    assert _close(b.x, a.x)
    assert _close(b.y, a.y)
