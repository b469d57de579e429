"""Matrix-free energy (heat) equation operator.

Replaces the reference's implicit FD heat-diffusion sparse assembly
(SURVEY.md §3.5).  Temperature lives on the corner (basic) nodes; advection
is Lagrangian (markers carry T), so the grid equation is pure implicit
diffusion + internal heating:

    rho*Cp/dt * T_new - div( k grad T_new ) = rho*Cp/dt * T_old + H

Conductivity is averaged onto the half-points between nodes (arithmetic or
harmonic, configurable — the reference uses simple FD with variable k).

Boundary rows: Dirichlet walls are identity rows (kbnd*T = kbnd*T_bc);
Neumann (flux) walls use mirrored ghost nodes (2nd-order one-sided stencil).
The operator is kept strictly LINEAR: the prescribed-flux constant goes into
``energy_rhs``, not into the ghost values.  Corner nodes: Dirichlet wins if
either adjoining wall is Dirichlet.
"""
from __future__ import annotations

import jax.numpy as jnp

from pylamp_tpu.core.bc import DIRICHLET, NEUMANN, ThermalBCs
from pylamp_tpu.core.grid import StaggeredGrid


def _face_k(k, axis: int, mode: str):
    """Average nodal conductivity onto half-points along ``axis``."""
    if axis == 1:
        a, b = k[:, :-1], k[:, 1:]
    else:
        a, b = k[:-1, :], k[1:, :]
    if mode == "arithmetic":
        return 0.5 * (a + b)
    if mode == "harmonic":
        return 2.0 * a * b / (a + b)
    raise ValueError(f"unknown k averaging mode {mode!r}")


def _dirichlet_masks(grid: StaggeredGrid, bcs: ThermalBCs, dtype):
    """Boolean mask of corner nodes pinned by a Dirichlet wall, and the
    corresponding BC values."""
    ny1, nx1 = grid.shape_corner
    mask = jnp.zeros((ny1, nx1), dtype=bool)
    vals = jnp.zeros((ny1, nx1), dtype=dtype)
    # Sides first, then top/bottom, so horizontal walls win the corners.
    if bcs.left.kind == DIRICHLET:
        mask = mask.at[:, 0].set(True)
        vals = vals.at[:, 0].set(bcs.left.value)
    if bcs.right.kind == DIRICHLET:
        mask = mask.at[:, -1].set(True)
        vals = vals.at[:, -1].set(bcs.right.value)
    if bcs.top.kind == DIRICHLET:
        mask = mask.at[0, :].set(True)
        vals = vals.at[0, :].set(bcs.top.value)
    if bcs.bottom.kind == DIRICHLET:
        mask = mask.at[-1, :].set(True)
        vals = vals.at[-1, :].set(bcs.bottom.value)
    return mask, vals


def _pad_mirror(T, k):
    """Pad T and k by one mirrored ghost node on every side.

    Mirror ghosts implement zero-flux Neumann walls; the prescribed-flux
    constant is handled in ``energy_rhs``.  On Dirichlet walls the padded
    values never matter (those rows are overwritten with identity rows).
    """
    Tp = jnp.pad(T, 1, mode="reflect")
    kp = jnp.pad(k, 1, mode="reflect")
    return Tp, kp


def _pad_x_periodic(a):
    """Wrap-pad one ghost column per side of a corner-lattice array whose
    column nx duplicates column 0 (period nx): the node west of column 0 is
    column nx-1, the node east of column nx is column 1."""
    return jnp.concatenate([a[:, -2:-1], a, a[:, 1:2]], axis=1)


def _pad_ghost(T, k, periodic_x: bool):
    """One ghost node per side: mirrored (Neumann walls), wrapped in x for
    periodic side walls."""
    if not periodic_x:
        return _pad_mirror(T, k)
    Tp = jnp.pad(T, ((1, 1), (0, 0)), mode="reflect")
    kp = jnp.pad(k, ((1, 1), (0, 0)), mode="reflect")
    return _pad_x_periodic(Tp), _pad_x_periodic(kp)


def energy_operator(
    T,
    k,
    rhocp_over_dt,
    grid: StaggeredGrid,
    bcs: ThermalBCs,
    kbnd: float = 1.0,
    k_avg: str = "arithmetic",
    halo_mesh=None,
):
    """Apply A_T T = rho*Cp/dt * T - div(k grad T), with BC rows.

    ``halo_mesh``: route through the explicit shard_map + ppermute halo
    path (parallel/halo_ops.py) instead of GSPMD partitioning."""
    if not grid.uniform:
        from pylamp_tpu.ops.stretched import energy_operator_stretched

        return energy_operator_stretched(
            T, k, rhocp_over_dt, grid, bcs, kbnd=kbnd, k_avg=k_avg
        )
    if halo_mesh is not None:
        from pylamp_tpu.parallel.halo_ops import energy_operator_halo, halo_eligible

        if halo_eligible(grid, halo_mesh):
            return energy_operator_halo(
                T, k, rhocp_over_dt, grid, bcs, halo_mesh, kbnd=kbnd, k_avg=k_avg
            )
    dx, dy = grid.dx, grid.dy
    Tp, kp = _pad_ghost(T, k, bcs.periodic_x)

    kx = _face_k(kp, 1, k_avg)  # (ny+3, nx+2)
    ky = _face_k(kp, 0, k_avg)  # (ny+2, nx+3)

    flux_x = kx * (Tp[:, 1:] - Tp[:, :-1]) / dx  # at x half-points
    flux_y = ky * (Tp[1:, :] - Tp[:-1, :]) / dy
    div = (flux_x[1:-1, 1:] - flux_x[1:-1, :-1]) / dx + (
        flux_y[1:, 1:-1] - flux_y[:-1, 1:-1]
    ) / dy  # (ny+1, nx+1)

    r = rhocp_over_dt * T - div
    if bcs.periodic_x:
        # seam columns 0 and nx are one physical node: half-row convention
        # (core/bc.py) keeps the embedded operator symmetric
        r = r.at[:, 0].mul(0.5).at[:, -1].mul(0.5)

    mask, _ = _dirichlet_masks(grid, bcs, T.dtype)
    return jnp.where(mask, kbnd * T, r)


def energy_rhs(
    T_old,
    k,
    rhocp_over_dt,
    H,
    grid: StaggeredGrid,
    bcs: ThermalBCs,
    kbnd: float = 1.0,
    k_avg: str = "arithmetic",
):
    """RHS matching ``energy_operator``: rho*Cp/dt * T_old + H, plus the
    prescribed-flux constants of Neumann walls, with Dirichlet rows set to
    kbnd * T_bc.

    Flux sign convention: ``value`` is the OUTWARD-normal temperature
    gradient dT/dn at the wall.  Eliminating the ghost (mirror + 2h*g) into
    the boundary row yields a uniform +2*k_face*g/h RHS contribution on
    every wall (derived independently in tests/oracle/energy_oracle.py).
    """
    if not grid.uniform:
        from pylamp_tpu.ops.stretched import energy_rhs_stretched

        return energy_rhs_stretched(
            T_old, k, rhocp_over_dt, H, grid, bcs, kbnd=kbnd, k_avg=k_avg
        )
    dx, dy = grid.dx, grid.dy
    b = rhocp_over_dt * T_old + H
    if bcs.periodic_x:
        b = b.at[:, 0].mul(0.5).at[:, -1].mul(0.5)

    kp = jnp.pad(k, 1, mode="reflect")
    kx = _face_k(kp, 1, k_avg)[1:-1, :]  # (ny+1, nx+2)
    ky = _face_k(kp, 0, k_avg)[:, 1:-1]  # (ny+2, nx+1)
    if bcs.left.kind == NEUMANN and bcs.left.value != 0.0:
        b = b.at[:, 0].add(2.0 * kx[:, 1] * bcs.left.value / dx)
    if bcs.right.kind == NEUMANN and bcs.right.value != 0.0:
        b = b.at[:, -1].add(2.0 * kx[:, -2] * bcs.right.value / dx)
    if bcs.top.kind == NEUMANN and bcs.top.value != 0.0:
        b = b.at[0, :].add(2.0 * ky[1, :] * bcs.top.value / dy)
    if bcs.bottom.kind == NEUMANN and bcs.bottom.value != 0.0:
        b = b.at[-1, :].add(2.0 * ky[-2, :] * bcs.bottom.value / dy)

    mask, vals = _dirichlet_masks(grid, bcs, T_old.dtype)
    return jnp.where(mask, kbnd * vals, b)
