"""Marker advection: classical RK4 through the staggered velocity field
(SURVEY.md §3.2 "advect markers: RK4 — 4x grid2trac velocity at intermediate
positions").

Velocity interpolation pads vx/vy with their BC ghost rows/columns first, so
bilinear interpolation is defined on the whole closed domain and respects
free-slip / no-slip walls exactly (instead of clamping to the interior band
of vx/vy nodes).
"""
from __future__ import annotations

import jax.numpy as jnp

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid


def _padded_velocity(vx, vy, bcs: VelocityBCs):
    """Ghost-padded velocity grids covering the full domain.

    vx: (ny+2, nx+1) with origin (-dy/2, 0); vy: (ny+1, nx+2) with origin
    (0, -dx/2).  Periodic sides: vy's ghost columns wrap (vx already has
    both seam columns)."""
    top = bcs.s_top * vx[:1] + (1.0 - bcs.s_top) * bcs.vt_top
    bot = bcs.s_bottom * vx[-1:] + (1.0 - bcs.s_bottom) * bcs.vt_bottom
    vx_p = jnp.concatenate([top, vx, bot], axis=0)
    if bcs.periodic_x:
        left = vy[:, -1:]
        right = vy[:, :1]
    else:
        left = bcs.s_left * vy[:, :1] + (1.0 - bcs.s_left) * bcs.vt_left
        right = bcs.s_right * vy[:, -1:] + (1.0 - bcs.s_right) * bcs.vt_right
    vy_p = jnp.concatenate([left, vy, right], axis=1)
    return vx_p, vy_p


def _bilinear(f, fx, fy, nx_n, ny_n):
    i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx_n - 2)
    j0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny_n - 2)
    tx = jnp.clip(fx - i0, 0.0, 1.0)
    ty = jnp.clip(fy - j0, 0.0, 1.0)
    return (
        (1 - ty) * (1 - tx) * f[j0, i0]
        + (1 - ty) * tx * f[j0, i0 + 1]
        + ty * (1 - tx) * f[j0 + 1, i0]
        + ty * tx * f[j0 + 1, i0 + 1]
    )


def _bilinear_coords(f, xq, yq, xs, ys):
    """Bilinear sample of a lattice with explicit (monotone) node
    coordinate arrays — the stretched-grid path."""
    nc = xs.shape[0]
    nr = ys.shape[0]
    i0 = jnp.clip(jnp.searchsorted(xs, xq, side="right").astype(jnp.int32) - 1,
                  0, nc - 2)
    j0 = jnp.clip(jnp.searchsorted(ys, yq, side="right").astype(jnp.int32) - 1,
                  0, nr - 2)
    tx = jnp.clip((xq - xs[i0]) / (xs[i0 + 1] - xs[i0]), 0.0, 1.0)
    ty = jnp.clip((yq - ys[j0]) / (ys[j0 + 1] - ys[j0]), 0.0, 1.0)
    return (
        (1 - ty) * (1 - tx) * f[j0, i0]
        + (1 - ty) * tx * f[j0, i0 + 1]
        + ty * (1 - tx) * f[j0 + 1, i0]
        + ty * tx * f[j0 + 1, i0 + 1]
    )


def velocity_at(px, py, vx, vy, grid: StaggeredGrid, bcs: VelocityBCs):
    """Bilinear marker velocity from the ghost-padded staggered grids.
    With periodic sides the positions are wrapped into [0, lx) first (the
    flat gather has no locality constraint, unlike the bucket engine)."""
    if bcs.periodic_x:
        px = px - grid.lx * jnp.floor(px / grid.lx)
    vx_p, vy_p = _padded_velocity(vx, vy, bcs)
    if not grid.uniform:
        import numpy as np

        # ghost rows/cols mirror at one cell width (uniform convention)
        yc, xc = grid.y_center, grid.x_center
        ys_vx = np.concatenate([[yc[0] - grid.dys[0]], yc,
                                [yc[-1] + grid.dys[-1]]])
        xs_vy = np.concatenate([[xc[0] - grid.dxs[0]], xc,
                                [xc[-1] + grid.dxs[-1]]])
        dt_ = px.dtype
        ux = _bilinear_coords(vx_p, px, py, jnp.asarray(grid.x_corner, dt_),
                              jnp.asarray(ys_vx, dt_))
        uy = _bilinear_coords(vy_p, px, py, jnp.asarray(xs_vy, dt_),
                              jnp.asarray(grid.y_corner, dt_))
        return ux, uy
    dx, dy = grid.dx, grid.dy
    # vx lattice: x = i*dx, y = (j-1/2)*dy for padded row j
    ux = _bilinear(vx_p, px / dx, py / dy + 0.5, grid.nx + 1, grid.ny + 2)
    uy = _bilinear(vy_p, px / dx + 0.5, py / dy, grid.nx + 2, grid.ny + 1)
    return ux, uy


def advect_rk4(px, py, vx, vy, dt, grid: StaggeredGrid, bcs: VelocityBCs):
    """One RK4 step for all markers; positions are clamped to the closed
    domain (walls are impermeable — overshoot can only come from
    interpolation/integration error)."""

    def vel(x, y):
        return velocity_at(x, y, vx, vy, grid, bcs)

    k1x, k1y = vel(px, py)
    k2x, k2y = vel(px + 0.5 * dt * k1x, py + 0.5 * dt * k1y)
    k3x, k3y = vel(px + 0.5 * dt * k2x, py + 0.5 * dt * k2y)
    k4x, k4y = vel(px + dt * k3x, py + dt * k3y)

    nx_new = px + dt / 6.0 * (k1x + 2 * k2x + 2 * k3x + k4x)
    ny_new = py + dt / 6.0 * (k1y + 2 * k2y + 2 * k3y + k4y)

    eps_x = 1e-6 * grid.dx_min
    eps_y = 1e-6 * grid.dy_min
    if bcs.periodic_x:
        x_out = nx_new - grid.lx * jnp.floor(nx_new / grid.lx)
    else:
        x_out = jnp.clip(nx_new, eps_x, grid.lx - eps_x)
    return (
        x_out,
        jnp.clip(ny_new, eps_y, grid.ly - eps_y),
    )
