"""Equation scaling for the Stokes saddle-point system.

The reference balances its assembled matrix rows with Gerya-style scale
factors (continuity rows multiplied by ~2*eta/(dx+dy), Dirichlet rows by a
matching magnitude) so the direct solver sees an O(1)-conditioned block
structure; we do the same for the Krylov solver (SURVEY.md §2.1 "Stokes +
continuity assembly").
"""
from __future__ import annotations

import jax.numpy as jnp

from pylamp_tpu.core.grid import StaggeredGrid


def characteristic_viscosity(eta_n):
    """Geometric mean — robust across many orders of magnitude."""
    return jnp.exp(jnp.mean(jnp.log(eta_n)))


def stokes_scales(eta_char, grid: StaggeredGrid):
    """(kcont, kbnd): continuity-row and Dirichlet-row scale factors
    (stretched grids use the smallest cell — the stiffest rows)."""
    dx, dy = grid.dx_min, grid.dy_min
    kcont = 2.0 * eta_char / (dx + dy)
    kbnd = 4.0 * eta_char / min(dx, dy) ** 2
    return kcont, kbnd
