"""Matrix-free Stokes + energy operators on NON-UNIFORM (stretched) grids.

The uniform operators (ops/stokes.py, ops/energy.py) divide by the scalar
cell size; on a stretched grid every derivative carries its own spacing
(the classic Gerya variable-grid discretization):

- per-cell widths   dxc_i = xe[i+1] - xe[i]         (nx,)   [likewise dyc]
- center distances  dxv_i = (dxc_{i-1} + dxc_i)/2   (nx-1,) between
  adjacent cell centers — the divisor of d(sxx)/dx and dp/dx at interior
  vx nodes
- node-row gaps for the shear terms: the vx rows live at y-centers, so
  dvx/dy at corner row J divides by (dyc_{J-1} + dyc_J)/2; at the walls
  the ghost row mirrors at one cell height (dyc_0 / dyc_{ny-1}), exactly
  the uniform code's convention.

All spacing vectors are tiny host-side numpy arrays broadcast as (1, nx)
or (ny, 1) constants — XLA folds them into the stencil like any other
coefficient.  Periodic side walls are not supported on stretched grids
(core/bc.py periodic assumes a uniform wrap); callers raise.

Verified against an independently assembled scipy matrix (the stretched
oracle path) to 1e-12 — tests/test_stretched.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pylamp_tpu.core.bc import DIRICHLET, NEUMANN, VelocityBCs, ThermalBCs
from pylamp_tpu.core.grid import StaggeredGrid


def _spacings(grid: StaggeredGrid, dtype=None):
    """(dxc (1,nx), dyc (ny,1), dxv (1,nx-1), dyv (ny-1,1),
    dxn (1,nx+1), dyn (ny+1,1)) row/col vectors, cast to ``dtype``.

    ``dtype`` must be the FIELD dtype: numpy's default float64 vectors
    would otherwise promote every f32 stretched apply to f64 under x64
    (the mixed-precision inner solve then fails jit carry checks —
    caught by bench --stretch-y).

    dxn/dyn are the corner-lattice gaps used by the shear/flux terms:
    interior entries are center distances, wall entries one cell width
    (ghost mirrored at one cell)."""
    dxc = grid.dxs
    dyc = grid.dys
    dxv = 0.5 * (dxc[:-1] + dxc[1:])
    dyv = 0.5 * (dyc[:-1] + dyc[1:])
    dxn = np.concatenate([[dxc[0]], dxv, [dxc[-1]]])
    dyn = np.concatenate([[dyc[0]], dyv, [dyc[-1]]])
    out = (
        dxc[None, :], dyc[:, None], dxv[None, :], dyv[:, None],
        dxn[None, :], dyn[:, None],
    )
    if dtype is not None:
        out = tuple(a.astype(dtype) for a in out)
    return out


def _ghost_vx(vx, bcs):
    top = bcs.s_top * vx[:1, :]
    bot = bcs.s_bottom * vx[-1:, :]
    return jnp.concatenate([top, vx, bot], axis=0)


def _ghost_vy(vy, bcs):
    left = bcs.s_left * vy[:, :1]
    right = bcs.s_right * vy[:, -1:]
    return jnp.concatenate([left, vy, right], axis=1)


def shear_stress_xy_stretched(vx, vy, eta_s, grid: StaggeredGrid,
                              bcs: VelocityBCs):
    """sxy = eta_s (dvx/dy + dvy/dx) at all corner nodes, (ny+1, nx+1)."""
    _, _, _, _, dxn, dyn = _spacings(grid, vx.dtype)
    vx_g = _ghost_vx(vx, bcs)
    vy_g = _ghost_vy(vy, bcs)
    dvxdy = (vx_g[1:, :] - vx_g[:-1, :]) / dyn
    dvydx = (vy_g[:, 1:] - vy_g[:, :-1]) / dxn
    return eta_s * (dvxdy + dvydx)


def stokes_operator_stretched(vx, vy, p, eta_s, eta_n, grid: StaggeredGrid,
                              bcs: VelocityBCs, kcont=1.0, kbnd=1.0):
    """Apply the variable-spacing Stokes operator; same output contract as
    ops.stokes.stokes_operator."""
    if bcs.periodic_x:
        raise ValueError("periodic side walls are not supported on "
                         "stretched grids")
    dxc, dyc, dxv, dyv, _, _ = _spacings(grid, vx.dtype)

    sxy = shear_stress_xy_stretched(vx, vy, eta_s, grid, bcs)

    dvxdx = (vx[:, 1:] - vx[:, :-1]) / dxc  # (ny, nx)
    dvydy = (vy[1:, :] - vy[:-1, :]) / dyc
    sxx = 2.0 * eta_n * dvxdx
    syy = 2.0 * eta_n * dvydy

    # x-momentum on interior vx nodes i=1..nx-1
    rx_int = (
        -(sxx[:, 1:] - sxx[:, :-1]) / dxv
        - (sxy[1:, 1:-1] - sxy[:-1, 1:-1]) / dyc
        + (p[:, 1:] - p[:, :-1]) / dxv
    )
    rx = jnp.concatenate([kbnd * vx[:, :1], rx_int, kbnd * vx[:, -1:]], axis=1)

    # y-momentum on interior vy nodes j=1..ny-1
    ry_int = (
        -(syy[1:, :] - syy[:-1, :]) / dyv
        - (sxy[1:-1, 1:] - sxy[1:-1, :-1]) / dxc
        + (p[1:, :] - p[:-1, :]) / dyv
    )
    ry = jnp.concatenate([kbnd * vy[:1, :], ry_int, kbnd * vy[-1:, :]], axis=0)

    rc = kcont * (dvxdx + dvydy)
    return rx, ry, rc


def velocity_diagonals_stretched(eta_s, eta_n, grid: StaggeredGrid, kbnd):
    """Analytic momentum-stencil diagonals on a stretched grid (Jacobi /
    Chebyshev smoothing)."""
    dxc, dyc, dxv, dyv, _, _ = _spacings(grid, eta_n.dtype)
    # vx node i couples to sxx in cells i-1, i (each 2 eta_n / dxc) over dxv,
    # and to sxy rows j, j+1 (eta_s / dyn ~ dyc at the vx row) over dyc.
    dvx_int = (
        2.0 * (eta_n[:, 1:] / dxc[:, 1:] + eta_n[:, :-1] / dxc[:, :-1]) / dxv
        + (eta_s[1:, 1:-1] + eta_s[:-1, 1:-1]) / dyc**2
    )
    dvx = jnp.concatenate(
        [jnp.full_like(dvx_int[:, :1], kbnd), dvx_int,
         jnp.full_like(dvx_int[:, :1], kbnd)], axis=1,
    )
    dvy_int = (
        2.0 * (eta_n[1:, :] / dyc[1:, :] + eta_n[:-1, :] / dyc[:-1, :]) / dyv
        + (eta_s[1:-1, 1:] + eta_s[1:-1, :-1]) / dxc**2
    )
    dvy = jnp.concatenate(
        [jnp.full_like(dvy_int[:1, :], kbnd), dvy_int,
         jnp.full_like(dvy_int[:1, :], kbnd)], axis=0,
    )
    return dvx, dvy


def pressure_gradient_stretched(zp, grid: StaggeredGrid, dtype):
    """G z_p on a stretched grid (zero on Dirichlet rows)."""
    _, _, dxv, dyv, _, _ = _spacings(grid, dtype)
    gx_int = (zp[:, 1:] - zp[:, :-1]) / dxv
    zeros_x = jnp.zeros((grid.ny, 1), dtype)
    gx = jnp.concatenate([zeros_x, gx_int, zeros_x], axis=1)
    gy_int = (zp[1:, :] - zp[:-1, :]) / dyv
    zeros_y = jnp.zeros((1, grid.nx), dtype)
    gy = jnp.concatenate([zeros_y, gy_int, zeros_y], axis=0)
    return gx, gy


# -- energy -------------------------------------------------------------------

def _face_k(k, axis: int, mode: str):
    if axis == 1:
        a, b = k[:, :-1], k[:, 1:]
    else:
        a, b = k[:-1, :], k[1:, :]
    if mode == "arithmetic":
        return 0.5 * (a + b)
    if mode == "harmonic":
        return 2.0 * a * b / (a + b)
    raise ValueError(f"unknown k averaging mode {mode!r}")


def _corner_volumes(grid: StaggeredGrid, dtype=None):
    """Control-volume extents of the corner nodes: (wy (ny+1,1), wx (1,nx+1))
    with interior = center distance, wall = half a cell (mirror ghost at one
    cell width makes the wall flux term divide by the full cell — identical
    to the uniform code's convention, where every divisor is dy)."""
    dxc = grid.dxs
    dyc = grid.dys
    # the uniform operator divides the node divergence by dy everywhere
    # (ghost mirrored at one cell) -> generalize: wall rows use dyc edge
    wx = np.concatenate([[dxc[0]], 0.5 * (dxc[:-1] + dxc[1:]), [dxc[-1]]])
    wy = np.concatenate([[dyc[0]], 0.5 * (dyc[:-1] + dyc[1:]), [dyc[-1]]])
    if dtype is not None:
        wx, wy = wx.astype(dtype), wy.astype(dtype)
    return wy[:, None], wx[None, :]


def _dirichlet_masks(grid, bcs, dtype):
    from pylamp_tpu.ops.energy import _dirichlet_masks as _dm

    return _dm(grid, bcs, dtype)


def energy_operator_stretched(T, k, rhocp_over_dt, grid: StaggeredGrid,
                              bcs: ThermalBCs, kbnd=1.0,
                              k_avg: str = "arithmetic"):
    """rho*Cp/dt * T - div(k grad T) with variable spacing; same contract as
    ops.energy.energy_operator.  The node-to-node flux between corner nodes
    i and i+1 divides by the cell width dxc_i; the divergence at node i
    divides by the node control width (center distance; one cell at walls,
    matching the mirror-ghost convention of the uniform path)."""
    if bcs.periodic_x:
        raise ValueError("periodic side walls are not supported on "
                         "stretched grids")
    dxc = grid.dxs
    dyc = grid.dys
    wy, wx = _corner_volumes(grid, T.dtype)
    # ghost gaps: mirror at one cell width (cast to the field dtype: the
    # numpy f64 vectors would promote f32 applies under x64)
    gx = np.concatenate([[dxc[0]], dxc, [dxc[-1]]]).astype(T.dtype)[None, :]
    gy = np.concatenate([[dyc[0]], dyc, [dyc[-1]]]).astype(T.dtype)[:, None]

    Tp = jnp.pad(T, 1, mode="reflect")
    kp = jnp.pad(k, 1, mode="reflect")
    kx = _face_k(kp, 1, k_avg)  # (ny+3, nx+2)
    ky = _face_k(kp, 0, k_avg)  # (ny+2, nx+3)

    flux_x = kx * (Tp[:, 1:] - Tp[:, :-1]) / gx
    flux_y = ky * (Tp[1:, :] - Tp[:-1, :]) / gy
    div = (flux_x[1:-1, 1:] - flux_x[1:-1, :-1]) / wx + (
        flux_y[1:, 1:-1] - flux_y[:-1, 1:-1]
    ) / wy

    r = rhocp_over_dt * T - div
    mask, _ = _dirichlet_masks(grid, bcs, T.dtype)
    return jnp.where(mask, kbnd * T, r)


def energy_rhs_stretched(T_old, k, rhocp_over_dt, H, grid: StaggeredGrid,
                         bcs: ThermalBCs, kbnd=1.0,
                         k_avg: str = "arithmetic"):
    """RHS matching energy_operator_stretched (mirror-ghost Neumann
    elimination: +2*k_face*g/w per wall with w the wall control width)."""
    wy, wx = _corner_volumes(grid, T_old.dtype)
    b = rhocp_over_dt * T_old + H

    kp = jnp.pad(k, 1, mode="reflect")
    kx = _face_k(kp, 1, k_avg)[1:-1, :]
    ky = _face_k(kp, 0, k_avg)[:, 1:-1]
    if bcs.left.kind == NEUMANN and bcs.left.value != 0.0:
        b = b.at[:, 0].add(2.0 * kx[:, 1] * bcs.left.value / wx[0, 0])
    if bcs.right.kind == NEUMANN and bcs.right.value != 0.0:
        b = b.at[:, -1].add(2.0 * kx[:, -2] * bcs.right.value / wx[0, -1])
    if bcs.top.kind == NEUMANN and bcs.top.value != 0.0:
        b = b.at[0, :].add(2.0 * ky[1, :] * bcs.top.value / wy[0, 0])
    if bcs.bottom.kind == NEUMANN and bcs.bottom.value != 0.0:
        b = b.at[-1, :].add(2.0 * ky[-2, :] * bcs.bottom.value / wy[-1, 0])

    mask, vals = _dirichlet_masks(grid, bcs, T_old.dtype)
    return jnp.where(mask, kbnd * vals, b)


def energy_diagonal_stretched(k, rhocp_over_dt, grid: StaggeredGrid,
                              bcs: ThermalBCs, kbnd, k_avg):
    dxc = grid.dxs
    dyc = grid.dys
    wy, wx = _corner_volumes(grid, k.dtype)
    gx = np.concatenate([[dxc[0]], dxc, [dxc[-1]]]).astype(k.dtype)[None, :]
    gy = np.concatenate([[dyc[0]], dyc, [dyc[-1]]]).astype(k.dtype)[:, None]
    kp = jnp.pad(k, 1, mode="reflect")
    kx = _face_k(kp, 1, k_avg) / gx   # (ny+3, nx+2)
    ky = _face_k(kp, 0, k_avg) / gy   # (ny+2, nx+3)
    diag = (
        rhocp_over_dt
        + (kx[1:-1, 1:] + kx[1:-1, :-1]) / wx
        + (ky[1:, 1:-1] + ky[:-1, 1:-1]) / wy
    )
    mask, _ = _dirichlet_masks(grid, bcs, k.dtype)
    return jnp.where(mask, kbnd, diag)
