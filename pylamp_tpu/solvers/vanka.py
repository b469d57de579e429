"""Coupled geometric multigrid with a Vanka-type box smoother.

The block-triangular MG in solvers/mg.py (velocity V-cycles + diagonal Schur
surrogate) degrades under extreme sharp-interface viscosity contrast — the
sticky-air benchmark (BASELINE config 5, SURVEY.md §7.3 risk #1) costs
~1000 Krylov iterations/step with it.  This module implements the classic
fix ("Vanka smoother fallback", SURVEY.md §7.3 item 1): multigrid on the
FULL (vx, vy, p) saddle-point system whose smoother updates, cell by cell,
the coupled 5-DOF box (4 face velocities + cell pressure), so pressure and
velocity relax *together* and the smoother remains effective where the
pressure field jumps by decades across one cell.

Design (all dense slicing on static shapes — TPU/XLA-friendly, GSPMD
shardable):

- **Diagonal Vanka, red-black**: each cell's 5x5 local saddle system is
  solved with the diagonal approximation of the momentum block (the full A
  coupling is left to the outer sweeps), which reduces to a closed-form
  pressure update followed by face-velocity updates.  Checkerboard cells
  share no faces, so a color's cells update simultaneously and exactly —
  two colors per sweep = multiplicative (Gauss-Seidel) Vanka with one
  residual recomputation between colors.
- rediscretized coarse operators with geometric-mean viscosity coarsening
  (mg.py:coarsen_eta); velocity transfers reuse the BC-aware staggered
  bilinear pair from mg.py; pressure transfers are the adjoint
  injection/4-cell-average pair.
- used as FGMRES preconditioner via make_vanka_mg_preconditioner (selected
  with SolverConfig.preconditioner = "vanka").
"""
from __future__ import annotations

import jax.numpy as jnp

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.stokes import stokes_operator
from pylamp_tpu.solvers.mg import (
    coarsen_eta,
    num_levels,
    prolong_vx,
    prolong_vy,
    restrict_vx,
    restrict_vy,
)
from pylamp_tpu.solvers.stokes_solver import velocity_diagonals


# -- pressure (cell-centered) transfers ----------------------------------------

def restrict_p(f):
    """(2NY, 2NX) -> (NY, NX): 4-child average (P^T/4 of injection)."""
    return 0.25 * (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2])


def prolong_p(c):
    """(NY, NX) -> (2NY, 2NX): piecewise-constant injection."""
    ny, nx = c.shape
    return jnp.broadcast_to(c[:, None, :, None], (ny, 2, nx, 2)).reshape(2 * ny, 2 * nx)


# -- the Vanka cell update -------------------------------------------------------

def _cell_masks(grid: StaggeredGrid, dtype):
    """Gradient coefficients g_k = d(momentum row k)/d(p of this cell),
    zeroed on Dirichlet (wall-normal boundary) rows."""
    ny, nx = grid.ny, grid.nx
    one = jnp.ones((ny, nx), dtype)
    gL = (one / grid.dx).at[:, 0].set(0.0)
    gR = (-one / grid.dx).at[:, -1].set(0.0)
    gT = (one / grid.dy).at[0, :].set(0.0)
    gB = (-one / grid.dy).at[-1, :].set(0.0)
    return gL, gR, gT, gB


def _vanka_update(rx, ry, rc, dvx, dvy, gmasks, grid, kcont, mask):
    """Per-cell coupled correction (diagonal Vanka) for cells where ``mask``.

    Returns (dvx_field, dvy_field, dp_field) with the shapes of (vx, vy, p).
    """
    gL, gR, gT, gB = gmasks
    aL, aR = dvx[:, :-1], dvx[:, 1:]
    aT, aB = dvy[:-1, :], dvy[1:, :]
    rL, rR = rx[:, :-1], rx[:, 1:]
    rT, rB = ry[:-1, :], ry[1:, :]
    bL = -kcont / grid.dx
    bR = kcont / grid.dx
    bT = -kcont / grid.dy
    bB = kcont / grid.dy

    S = bL * gL / aL + bR * gR / aR + bT * gT / aT + bB * gB / aB
    num = bL * rL / aL + bR * rR / aR + bT * rT / aT + bB * rB / aB - rc
    dp = jnp.where(S != 0, num / jnp.where(S == 0, 1.0, S), 0.0)
    dp = jnp.where(mask, dp, 0.0)

    dL = jnp.where(mask, (rL - gL * dp) / aL, 0.0)
    dR = jnp.where(mask, (rR - gR * dp) / aR, 0.0)
    dT = jnp.where(mask, (rT - gT * dp) / aT, 0.0)
    dB = jnp.where(mask, (rB - gB * dp) / aB, 0.0)

    # scatter cell-face corrections onto the face lattices; adjacent cells
    # have opposite colors, so each face receives exactly one contribution
    dvx_f = jnp.zeros((grid.ny, grid.nx + 1), rx.dtype)
    dvx_f = dvx_f.at[:, :-1].add(dL).at[:, 1:].add(dR)
    dvy_f = jnp.zeros((grid.ny + 1, grid.nx), ry.dtype)
    dvy_f = dvy_f.at[:-1, :].add(dT).at[1:, :].add(dB)
    return dvx_f, dvy_f, dp


def make_vanka_smoother(eta_s, eta_n, grid: StaggeredGrid, bcs: VelocityBCs,
                        kcont, kbnd, omega: float = 1.0):
    """Returns smooth(u, rhs, sweeps) performing red-black multiplicative
    diagonal-Vanka sweeps on the full saddle system."""
    dtype = eta_n.dtype
    dvx, dvy = velocity_diagonals(eta_s, eta_n, grid, kbnd)
    gmasks = _cell_masks(grid, dtype)
    ii = jnp.arange(grid.nx)[None, :]
    jj = jnp.arange(grid.ny)[:, None]
    red = (ii + jj) % 2 == 0

    def smooth(u, rhs, sweeps: int):
        vx, vy, p = u
        bx, by, bc = rhs
        for _ in range(sweeps):
            for mask in (red, ~red):
                ax, ay, ac = stokes_operator(
                    vx, vy, p, eta_s, eta_n, grid, bcs, kcont=kcont, kbnd=kbnd
                )
                dx_f, dy_f, dp = _vanka_update(
                    bx - ax, by - ay, bc - ac, dvx, dvy, gmasks, grid, kcont, mask
                )
                vx = vx + omega * dx_f
                vy = vy + omega * dy_f
                p = p + omega * dp
        return vx, vy, p

    return smooth


# -- the coupled V-cycle ---------------------------------------------------------

def make_coupled_vanka_mg(
    eta_s,
    eta_n,
    grid: StaggeredGrid,
    bcs: VelocityBCs,
    kcont,
    kbnd,
    levels: int = 0,
    pre_smooth: int = 2,
    post_smooth: int = 2,
    coarse_sweeps: int = 24,
    omega: float = 1.0,
):
    """Returns mg(rhs) -> u: one V-cycle on the full (vx, vy, p) system from
    a zero initial guess."""
    nlev = num_levels(grid, levels)
    dtype = eta_n.dtype

    grids = [grid]
    etas = [(eta_s, eta_n)]
    for _ in range(nlev - 1):
        g = grids[-1]
        grids.append(StaggeredGrid(nx=g.nx // 2, ny=g.ny // 2, lx=g.lx, ly=g.ly))
        etas.append(coarsen_eta(*etas[-1]))

    # Dirichlet-row scaling follows the stencil's h^-2 growth per level;
    # the continuity scaling kcont is h-independent row scaling and must
    # stay the same on every level so restricted residuals stay consistent.
    kbnds = [kbnd * (grids[0].dx / g.dx) ** 2 for g in grids]
    smoothers = [
        make_vanka_smoother(es, en, g, bcs, kcont, kb, omega=omega)
        for (es, en), g, kb in zip(etas, grids, kbnds)
    ]

    def apply_op(l, u):
        es, en = etas[l]
        return stokes_operator(
            u[0], u[1], u[2], es, en, grids[l], bcs, kcont=kcont, kbnd=kbnds[l]
        )

    def zeros(l):
        g = grids[l]
        return (
            jnp.zeros(g.shape_vx, dtype),
            jnp.zeros(g.shape_vy, dtype),
            jnp.zeros(g.shape_center, dtype),
        )

    def vcycle(l, rhs):
        if l == nlev - 1:
            return smoothers[l](zeros(l), rhs, coarse_sweeps)
        u = smoothers[l](zeros(l), rhs, pre_smooth)
        ax, ay, ac = apply_op(l, u)
        r = (rhs[0] - ax, rhs[1] - ay, rhs[2] - ac)
        rc = (restrict_vx(r[0], bcs), restrict_vy(r[1], bcs), restrict_p(r[2]))
        ec = vcycle(l + 1, rc)
        u = (
            u[0] + prolong_vx(ec[0], bcs),
            u[1] + prolong_vy(ec[1], bcs),
            u[2] + prolong_p(ec[2]),
        )
        return smoothers[l](u, rhs, post_smooth)

    def mg(rhs):
        return vcycle(0, rhs)

    return mg


def make_vanka_mg_preconditioner(
    eta_s,
    eta_n,
    grid: StaggeredGrid,
    kcont,
    kbnd,
    bcs: VelocityBCs = None,
    levels: int = 0,
    cycles: int = 1,
    pre_smooth: int = 2,
    post_smooth: int = 2,
    coarse_sweeps: int = 24,
    omega: float = 1.0,
):
    """FGMRES preconditioner: coupled Vanka-MG V-cycle(s) on the full
    residual; pressure returned in the mean-zero gauge (the constant-
    pressure nullspace is projected once per application)."""
    if bcs is None:
        bcs = VelocityBCs()
    mg = make_coupled_vanka_mg(
        eta_s, eta_n, grid, bcs, kcont, kbnd,
        levels=levels, pre_smooth=pre_smooth, post_smooth=post_smooth,
        coarse_sweeps=coarse_sweeps, omega=omega,
    )

    def M(r):
        z = mg(r)
        for _ in range(cycles - 1):
            ax, ay, ac = stokes_operator(
                z[0], z[1], z[2], eta_s, eta_n, grid, bcs, kcont=kcont, kbnd=kbnd
            )
            d = mg((r[0] - ax, r[1] - ay, r[2] - ac))
            z = (z[0] + d[0], z[1] + d[1], z[2] + d[2])
        zp = z[2] - jnp.mean(z[2])
        return (z[0], z[1], zp)

    return M
