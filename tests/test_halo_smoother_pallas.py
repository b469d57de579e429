"""Fused per-shard Chebyshev smoother under the explicit-halo engine
(parallel/halo_smoother.py + ops/pallas/cheb_block_kernel.py) vs the jnp
recurrence — interpret mode on the 8-virtual-device CPU mesh, fp32
tolerance (round-4 verdict item 1, second half)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.pallas.cheb_kernel import chebyshev_coeffs
from pylamp_tpu.parallel.halo_smoother import (
    chebyshev_smooth_halo,
    halo_smoother_eligible,
)
from pylamp_tpu.parallel.mesh import make_mesh
from pylamp_tpu.solvers.mg import momentum_apply
from pylamp_tpu.solvers.stokes_solver import velocity_diagonals

GRID = StaggeredGrid(nx=64, ny=64, lx=1.3, ly=1.0)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _jnp_cheb(ex, ey, rx, ry, eta_s, eta_n, grid, bcs, kbnd, lam, iters,
              zero_init):
    """Reference recurrence (mirrors solvers/mg.py smooth())."""
    dvx, dvy = velocity_diagonals(eta_s, eta_n, grid, kbnd, bcs=bcs)
    co = np.asarray(chebyshev_coeffs(jnp.asarray(lam, jnp.float32), iters))
    dxs = jnp.zeros_like(ex)
    dys = jnp.zeros_like(ey)
    for k in range(iters):
        c1, c2 = float(co[k, 0]), float(co[k, 1])
        if zero_init and k == 0:
            dxs = c2 * rx / dvx
            dys = c2 * ry / dvy
        else:
            ax, ay = momentum_apply(ex, ey, eta_s, eta_n, grid, bcs, kbnd)
            dxs = c1 * dxs + c2 * (rx - ax) / dvx
            dys = c1 * dys + c2 * (ry - ay) / dvy
        ex = ex + dxs
        ey = ey + dys
    return ex, ey


def _fields(seed, zero_init):
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    eta_s = jnp.asarray(
        np.exp(rng.standard_normal(GRID.shape_corner) * 2.0), f32)
    eta_n = jnp.asarray(
        np.exp(rng.standard_normal(GRID.shape_center) * 2.0), f32)
    rx = jnp.asarray(rng.standard_normal(GRID.shape_vx), f32)
    ry = jnp.asarray(rng.standard_normal(GRID.shape_vy), f32)
    if zero_init:
        ex = jnp.zeros(GRID.shape_vx, f32)
        ey = jnp.zeros(GRID.shape_vy, f32)
    else:
        ex = jnp.asarray(rng.standard_normal(GRID.shape_vx), f32)
        ey = jnp.asarray(rng.standard_normal(GRID.shape_vy), f32)
    return ex, ey, rx, ry, eta_s, eta_n


@pytest.mark.parametrize(
    "iters,zero_init", [(3, False), (3, True), (2, False), (1, True),
                        (5, False)]
)
@pytest.mark.parametrize("bc", ["free_slip", "no_slip"])
def test_halo_fused_smoother_matches_jnp(mesh, iters, zero_init, bc):
    bcs = VelocityBCs(top=bc, bottom=bc, left=bc, right=bc)
    assert halo_smoother_eligible(GRID, mesh, bcs, jnp.float32, iters,
                                  interpret=True)
    ex, ey, rx, ry, es, en = _fields(5 + iters, zero_init)
    kbnd, lam = 7.5, 3.7

    ref_x, ref_y = _jnp_cheb(ex, ey, rx, ry, es, en, GRID, bcs, kbnd, lam,
                             iters, zero_init)
    out_x, out_y = jax.jit(
        lambda *a: chebyshev_smooth_halo(
            *a, GRID, bcs, kbnd, jnp.asarray(lam, jnp.float32), iters,
            mesh, zero_init=zero_init, interpret=True,
        )
    )(ex, ey, rx, ry, es, en)

    sx = float(jnp.max(jnp.abs(ref_x)))
    sy = float(jnp.max(jnp.abs(ref_y)))
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               atol=2e-5 * sx)
    np.testing.assert_allclose(np.asarray(out_y), np.asarray(ref_y),
                               atol=2e-5 * sy)


@pytest.mark.parametrize("iters,zero_init", [(2, True), (3, False)])
def test_halo_fused_smoother_emit_residual(mesh, iters, zero_init):
    """emit_residual: the frame's extra application must equal the
    explicit momentum_apply residual of its own smoothing result."""
    bcs = VelocityBCs()
    ex, ey, rx, ry, es, en = _fields(31 + iters, zero_init)
    kbnd, lam = 2.5, 4.1

    out = jax.jit(
        lambda *a: chebyshev_smooth_halo(
            *a, GRID, bcs, kbnd, jnp.asarray(lam, jnp.float32), iters,
            mesh, zero_init=zero_init, emit_residual=True, interpret=True,
        )
    )(ex, ey, rx, ry, es, en)
    out_x, out_y, rfx, rfy = out
    ax, ay = momentum_apply(out_x, out_y, es, en, GRID, bcs, kbnd)
    # scale by the residual magnitude itself (A of the smoothed iterate is
    # orders larger than rx at random viscosity)
    sx = float(jnp.max(jnp.abs(rx - ax)))
    sy = float(jnp.max(jnp.abs(ry - ay)))
    np.testing.assert_allclose(np.asarray(rfx), np.asarray(rx - ax),
                               atol=5e-6 * sx)
    np.testing.assert_allclose(np.asarray(rfy), np.asarray(ry - ay),
                               atol=5e-6 * sy)
