"""Implicit energy (heat diffusion) solve: Jacobi-preconditioned CG.

Replaces the reference's spsolve on the assembled diffusion matrix
(SURVEY.md §3.5).  The system is SPD (up to the scaled Dirichlet rows), so
CG is the right Krylov method.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pylamp_tpu.core.bc import ThermalBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.energy import (
    _dirichlet_masks,
    _face_k,
    _pad_ghost,
    energy_operator,
    energy_rhs,
)
from pylamp_tpu.solvers.krylov import SolveInfo, cg, fcg


class EnergySolution(NamedTuple):
    T: jnp.ndarray
    info: SolveInfo


def energy_diagonal(k, rhocp_over_dt, grid: StaggeredGrid, bcs: ThermalBCs, kbnd, k_avg):
    if not grid.uniform:
        from pylamp_tpu.ops.stretched import energy_diagonal_stretched

        return energy_diagonal_stretched(k, rhocp_over_dt, grid, bcs, kbnd, k_avg)
    dx, dy = grid.dx, grid.dy
    _, kp = _pad_ghost(k, k, bcs.periodic_x)
    kx = _face_k(kp, 1, k_avg)  # (ny+3, nx+2)
    ky = _face_k(kp, 0, k_avg)  # (ny+2, nx+3)
    diag = (
        rhocp_over_dt
        + (kx[1:-1, 1:] + kx[1:-1, :-1]) / dx**2
        + (ky[1:, 1:-1] + ky[:-1, 1:-1]) / dy**2
    )
    if bcs.periodic_x:
        diag = diag.at[:, 0].mul(0.5).at[:, -1].mul(0.5)
    mask, _ = _dirichlet_masks(grid, bcs, k.dtype)
    return jnp.where(mask, kbnd, diag)


def solve_energy(
    T_old,
    k,
    rhocp_over_dt,
    H,
    grid: StaggeredGrid,
    bcs: ThermalBCs,
    tol: float = 1e-10,
    maxiter: int = 2000,
    k_avg: str = "arithmetic",
    preconditioner: str = "jacobi",
    halo_mesh=None,
    mg_smoother: str = "chebyshev",
    mg_omega: float = 0.7,
    mg_semicoarsen: float = 0.0,
) -> EnergySolution:
    kbnd = jnp.mean(rhocp_over_dt) + 4.0 * jnp.mean(k) / min(grid.dx_min, grid.dy_min) ** 2

    def op(T):
        return energy_operator(T, k, rhocp_over_dt, grid, bcs, kbnd=kbnd,
                               k_avg=k_avg, halo_mesh=halo_mesh)

    b = energy_rhs(T_old, k, rhocp_over_dt, H, grid, bcs, kbnd=kbnd, k_avg=k_avg)
    M = _make_M(k, rhocp_over_dt, grid, bcs, kbnd, k_avg, preconditioner,
                halo_mesh=halo_mesh, mg_smoother=mg_smoother,
                mg_omega=mg_omega, mg_semicoarsen=mg_semicoarsen)

    # the MG V-cycle is only approximately SPD -> flexible CG (krylov.fcg)
    solve = cg if preconditioner == "jacobi" else fcg
    T, info = solve(op, b, T_old, M=M, tol=tol, maxiter=maxiter)
    return EnergySolution(T, info)


def _make_M(k, rhocp_over_dt, grid, bcs, kbnd, k_avg, preconditioner: str,
            halo_mesh=None, mg_smoother: str = "chebyshev",
            mg_omega: float = 0.7, mg_semicoarsen: float = 0.0):
    if preconditioner == "mg":
        from pylamp_tpu.solvers.energy_mg import make_energy_mg_preconditioner

        return make_energy_mg_preconditioner(
            k, rhocp_over_dt, grid, bcs, kbnd, k_avg=k_avg,
            halo_mesh=halo_mesh, smoother=mg_smoother, omega=mg_omega,
            semicoarsen=mg_semicoarsen,
        )
    if preconditioner != "jacobi":
        raise ValueError(f"unknown energy preconditioner {preconditioner!r}")
    diag = energy_diagonal(k, rhocp_over_dt, grid, bcs, kbnd, k_avg)
    return lambda r: r / diag


def solve_energy_mixed(
    T_old,
    k,
    rhocp_over_dt,
    H,
    grid: StaggeredGrid,
    bcs: ThermalBCs,
    tol: float = 1e-10,
    inner_tol: float = 1e-5,
    maxiter: int = 500,
    max_refinements: int = 5,
    k_avg: str = "arithmetic",
    preconditioner: str = "jacobi",
    halo_mesh=None,
    mg_smoother: str = "chebyshev",
    mg_omega: float = 0.7,
    mg_semicoarsen: float = 0.0,
) -> EnergySolution:
    """f32 CG inner solves inside f64 iterative refinement (see
    solvers/refine.py)."""
    import jax

    from pylamp_tpu.solvers.refine import refine

    f64, f32 = jnp.float64, jnp.float32
    k64 = k.astype(f64)
    rc64 = rhocp_over_dt.astype(f64)
    kbnd = jnp.mean(rc64) + 4.0 * jnp.mean(k64) / min(grid.dx_min, grid.dy_min) ** 2

    def op64(T):
        return energy_operator(T, k64, rc64, grid, bcs, kbnd=kbnd, k_avg=k_avg,
                               halo_mesh=halo_mesh)

    b64 = energy_rhs(
        T_old.astype(f64), k64, rc64, H.astype(f64), grid, bcs, kbnd=kbnd, k_avg=k_avg
    )

    k32, rc32, kbnd32 = k64.astype(f32), rc64.astype(f32), kbnd.astype(f32)

    def op32(T):
        return energy_operator(T, k32, rc32, grid, bcs, kbnd=kbnd32, k_avg=k_avg,
                               halo_mesh=halo_mesh)

    M32 = _make_M(k32, rc32, grid, bcs, kbnd32, k_avg, preconditioner,
                  halo_mesh=halo_mesh, mg_smoother=mg_smoother,
                  mg_semicoarsen=mg_semicoarsen,
                  mg_omega=mg_omega)
    solve32 = cg if preconditioner == "jacobi" else fcg

    def inner_solve(r32, tol32):
        return solve32(
            op32, r32, jnp.zeros_like(r32), M=M32,
            tol=tol32, maxiter=maxiter,
        )

    T, info = refine(
        op64, inner_solve, b64, T_old.astype(f64), tol=tol,
        max_refinements=max_refinements, inner_tol=inner_tol,
    )
    return EnergySolution(T, info)
