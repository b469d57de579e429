"""Model setup: grid + marker seeding + initial state from a ModelConfig
(SURVEY.md §3.1 initialization stack)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.interp import markers_to_grid
from pylamp_tpu.markers.seed import seed_markers
from pylamp_tpu.markers.state import MarkerState
from pylamp_tpu.models.config import ModelConfig
from pylamp_tpu.models.state import ModelState, zero_state
from pylamp_tpu.physics.materials import MaterialTable


def build(cfg: ModelConfig, dtype=jnp.float64):
    """Returns (grid, table, initial ModelState)."""
    grid = StaggeredGrid(nx=cfg.nx, ny=cfg.ny, lx=cfg.lx, ly=cfg.ly)
    table = MaterialTable(cfg.physics.materials)

    key = jax.random.PRNGKey(cfg.seed)
    x, y = seed_markers(grid, cfg.markers_per_cell_dim, key=key, dtype=dtype)

    xh, yh = np.asarray(x), np.asarray(y)
    mat = (
        np.asarray(cfg.material_of(xh, yh), dtype=np.int32)
        if cfg.material_of
        else np.zeros(xh.shape, np.int32)
    )
    T = (
        np.asarray(cfg.T_of(xh, yh), dtype=np.float64)
        if cfg.T_of
        else np.zeros(xh.shape)
    )

    markers = MarkerState(
        x=x, y=y, mat=jnp.asarray(mat), T=jnp.asarray(T, dtype)
    )
    state = zero_state(grid, markers, dtype)

    # Pre-fill grid mirrors (fallback values for starved nodes at step 1).
    eta_m = jnp.clip(
        table.viscosity_of(markers.mat, markers.T),
        cfg.physics.eta_min,
        cfg.physics.eta_max,
    )
    eta_s, _ = markers_to_grid(x, y, eta_m, grid, "corner", cfg.physics.eta_avg)
    eta_n, _ = markers_to_grid(x, y, eta_m, grid, "center", cfg.physics.eta_avg)
    T_g, _ = markers_to_grid(x, y, markers.T, grid, "corner", "arithmetic")
    state = state.replace(eta_s=eta_s, eta_n=eta_n, T=T_g)
    return grid, table, state
