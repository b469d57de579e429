"""Optional heating terms for the energy equation (SURVEY.md §2.1 "optional
internal heating"; shear and adiabatic heating are the standard optional
source terms in this class of thermomechanical codes).

Both are evaluated on the corner (temperature) grid:

- shear heating     H_s = sigma' : e' = 4 eta e_II^2
  (2-D incompressible: e'_yy = -e'_xx, so sigma:e = 4 eta (e_xx^2 + e_xy^2))
- adiabatic heating H_a = rho0 * alpha * T * g_y * vy   (y points down:
  downward motion against the thermal stratification heats)
"""
from __future__ import annotations

import jax.numpy as jnp

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.stokes import strain_rate_ii


def _center_to_corner(f):
    """Cell-center field -> corner nodes (4-point average, edge clamped)."""
    fp = jnp.pad(f, 1, mode="edge")
    return 0.25 * (fp[:-1, :-1] + fp[:-1, 1:] + fp[1:, :-1] + fp[1:, 1:])


def shear_heating(vx, vy, eta_n, grid: StaggeredGrid, bcs: VelocityBCs):
    """H_s on corner nodes."""
    eII = strain_rate_ii(vx, vy, grid, bcs)  # centers
    hs_center = 4.0 * eta_n * eII**2
    return _center_to_corner(hs_center)


def adiabatic_heating(T_corner, rho_alpha_corner, vy, gy, grid: StaggeredGrid):
    """H_a on corner nodes; ``rho_alpha_corner`` = rho0*alpha interpolated
    from markers to corners."""
    vp = jnp.pad(vy, ((0, 0), (1, 1)), mode="edge")
    vy_corner = 0.5 * (vp[:, :-1] + vp[:, 1:])  # (ny+1, nx+1)
    return rho_alpha_corner * T_corner * gy * vy_corner
