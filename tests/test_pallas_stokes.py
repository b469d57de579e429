"""Pallas fused momentum kernel vs the jnp reference operator (interpret
mode on CPU; the compiled kernel runs in the TPU smoother hot path)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.ops.pallas.stokes_kernel import momentum_apply_pallas
from pylamp_tpu.solvers.mg import _momentum_apply

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
@pytest.mark.parametrize("nx,ny,br", [(16, 16, 8), (24, 32, 16)])
def test_momentum_kernel_matches_jnp(slip, nx, ny, br):
    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.3, ly=0.9)
    bcs = VelocityBCs(top=slip, bottom="free_slip", left="no_slip", right=slip)
    vx = jnp.asarray(RNG.normal(size=grid.shape_vx).astype(np.float32))
    vy = jnp.asarray(RNG.normal(size=grid.shape_vy).astype(np.float32))
    eta_s = jnp.asarray(np.exp(RNG.normal(size=grid.shape_corner)).astype(np.float32))
    eta_n = jnp.asarray(np.exp(RNG.normal(size=grid.shape_center)).astype(np.float32))
    kbnd = 7.5

    want_rx, want_ry = _momentum_apply(vx, vy, eta_s, eta_n, grid, bcs, kbnd)
    got_rx, got_ry = momentum_apply_pallas(
        vx, vy, eta_s, eta_n, grid, bcs, kbnd, block_rows=br, interpret=True
    )
    # f32 with different accumulation order: compare at f32-roundoff scale
    sx = float(np.abs(np.asarray(want_rx)).max())
    sy = float(np.abs(np.asarray(want_ry)).max())
    np.testing.assert_allclose(np.asarray(got_rx), np.asarray(want_rx),
                               atol=1e-5 * sx)
    np.testing.assert_allclose(np.asarray(got_ry), np.asarray(want_ry),
                               atol=1e-5 * sy)


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
@pytest.mark.parametrize("nx,ny,br", [(16, 16, 8), (24, 32, 16)])
def test_saddle_kernel_matches_jnp(slip, nx, ny, br):
    """Fused full-saddle apply (momentum + grad p + continuity) == the jnp
    stokes_operator (interpret mode; the compiled kernel carries the FGMRES
    outer applies on TPU)."""
    from pylamp_tpu.ops.pallas.stokes_kernel import saddle_apply_pallas
    from pylamp_tpu.ops.stokes import stokes_operator

    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.3, ly=0.9)
    bcs = VelocityBCs(top=slip, bottom="free_slip", left="no_slip", right=slip)
    vx = jnp.asarray(RNG.normal(size=grid.shape_vx).astype(np.float32))
    vy = jnp.asarray(RNG.normal(size=grid.shape_vy).astype(np.float32))
    p = jnp.asarray(RNG.normal(size=grid.shape_center).astype(np.float32))
    eta_s = jnp.asarray(np.exp(RNG.normal(size=grid.shape_corner)).astype(np.float32))
    eta_n = jnp.asarray(np.exp(RNG.normal(size=grid.shape_center)).astype(np.float32))
    kcont, kbnd = 3.5, 7.5

    want = stokes_operator(vx, vy, p, eta_s, eta_n, grid, bcs,
                           kcont=kcont, kbnd=kbnd)
    got = saddle_apply_pallas(vx, vy, p, eta_s, eta_n, grid, bcs,
                              kcont, kbnd, block_rows=br, interpret=True)
    for g, w in zip(got, want):
        s = float(np.abs(np.asarray(w)).max())
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5 * s)


def _periodic_fields(grid):
    """Random f32 fields that satisfy the periodic seam conventions:
    vx and eta_s carry equal values in columns 0 and nx."""
    vx = RNG.normal(size=grid.shape_vx).astype(np.float32)
    vx[:, -1] = vx[:, 0]
    eta_s = np.exp(RNG.normal(size=grid.shape_corner)).astype(np.float32)
    eta_s[:, -1] = eta_s[:, 0]
    vy = RNG.normal(size=grid.shape_vy).astype(np.float32)
    eta_n = np.exp(RNG.normal(size=grid.shape_center)).astype(np.float32)
    p = RNG.normal(size=grid.shape_center).astype(np.float32)
    return (jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(p),
            jnp.asarray(eta_s), jnp.asarray(eta_n))


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
@pytest.mark.parametrize("nx,ny,br", [(16, 16, 8), (24, 32, 16)])
def test_momentum_kernel_periodic(slip, nx, ny, br):
    """Wrapped half-convention seam columns == the jnp operator under
    periodic side walls (round-3 verdict item 6)."""
    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.3, ly=0.9)
    bcs = VelocityBCs(top=slip, bottom="free_slip",
                      left="periodic", right="periodic")
    vx, vy, _, eta_s, eta_n = _periodic_fields(grid)
    kbnd = 7.5

    want_rx, want_ry = _momentum_apply(vx, vy, eta_s, eta_n, grid, bcs, kbnd)
    got_rx, got_ry = momentum_apply_pallas(
        vx, vy, eta_s, eta_n, grid, bcs, kbnd, block_rows=br, interpret=True
    )
    sx = float(np.abs(np.asarray(want_rx)).max())
    sy = float(np.abs(np.asarray(want_ry)).max())
    np.testing.assert_allclose(np.asarray(got_rx), np.asarray(want_rx),
                               atol=1e-5 * sx)
    np.testing.assert_allclose(np.asarray(got_ry), np.asarray(want_ry),
                               atol=1e-5 * sy)


@pytest.mark.parametrize("slip", ["free_slip", "no_slip"])
@pytest.mark.parametrize("nx,ny,br", [(16, 16, 8), (24, 32, 16)])
def test_saddle_kernel_periodic(slip, nx, ny, br):
    from pylamp_tpu.ops.pallas.stokes_kernel import saddle_apply_pallas
    from pylamp_tpu.ops.stokes import stokes_operator

    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.3, ly=0.9)
    bcs = VelocityBCs(top=slip, bottom="free_slip",
                      left="periodic", right="periodic")
    vx, vy, p, eta_s, eta_n = _periodic_fields(grid)
    kcont, kbnd = 3.5, 7.5

    want = stokes_operator(vx, vy, p, eta_s, eta_n, grid, bcs,
                           kcont=kcont, kbnd=kbnd)
    got = saddle_apply_pallas(vx, vy, p, eta_s, eta_n, grid, bcs,
                              kcont, kbnd, block_rows=br, interpret=True)
    for g, w in zip(got, want):
        s = float(np.abs(np.asarray(w)).max())
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5 * s)
