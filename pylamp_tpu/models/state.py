"""Full model state pytree: markers + last grid solution + clock.

Grid fields are carried so that (a) outputs/diagnostics don't re-solve,
(b) marker-starved nodes can fall back to the previous step's value, and
(c) the Stokes solve warm-starts from the previous velocity."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.state import MarkerState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelState:
    markers: MarkerState
    vx: jnp.ndarray
    vy: jnp.ndarray
    p: jnp.ndarray
    T: jnp.ndarray  # corner-node temperature (diagnostic mirror of markers)
    eta_s: jnp.ndarray
    eta_n: jnp.ndarray
    time: jnp.ndarray  # scalar
    step: jnp.ndarray  # scalar int
    dt: jnp.ndarray  # last dt taken
    # Per-MG-level lambda_max estimates carried across steps (warm-started
    # Chebyshev smoother bounds — solvers/mg.py estimate_mg_lambdas).
    # Shape (n_levels,); zeros mean "no estimate yet" (step 1 runs the full
    # power iteration).  None on configs without a Chebyshev-MG Stokes
    # preconditioner (the leaf then simply doesn't exist in the pytree).
    mg_lam: jnp.ndarray | None = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def zero_state(grid: StaggeredGrid, markers: MarkerState, dtype=jnp.float64,
               n_mg_levels: int = 0) -> ModelState:
    return ModelState(
        markers=markers,
        vx=jnp.zeros(grid.shape_vx, dtype),
        vy=jnp.zeros(grid.shape_vy, dtype),
        p=jnp.zeros(grid.shape_center, dtype),
        T=jnp.zeros(grid.shape_corner, dtype),
        eta_s=jnp.ones(grid.shape_corner, dtype),
        eta_n=jnp.ones(grid.shape_center, dtype),
        time=jnp.zeros((), dtype),
        step=jnp.zeros((), jnp.int32),
        dt=jnp.zeros((), dtype),
        mg_lam=jnp.zeros((n_mg_levels,), dtype) if n_mg_levels > 0 else None,
    )
