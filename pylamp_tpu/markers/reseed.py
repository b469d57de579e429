"""Marker repopulation for starved cells (SURVEY.md §7.2 step 5).

Advection slowly clusters markers; cells that drop below a minimum count
lose material-interface resolution.  The marker population is a fixed-size
array (static shapes under jit), so reseeding is implemented as *moving*
markers from the most crowded cells into the most starved ones:

- per-cell counts via one sort + segment offsets (deterministic)
- a static budget of K moves per call: k-th starved cell (ascending count)
  receives the first marker of the k-th most crowded cell
- the moved marker lands at the starved cell's center with a deterministic
  sub-cell offset; its temperature is re-interpolated from the grid, and its
  material id is the majority material of the starved cell's 3x3 cell
  neighborhood (one-hot histogram -> argmax)

All moves are no-ops (marker stays put) unless the starved cell is below
``min_per_cell`` AND the donor has more than ``2*min_per_cell`` markers.
"""
from __future__ import annotations

import jax.numpy as jnp

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.interp import grid_to_markers
from pylamp_tpu.markers.state import MarkerState


def _cell_ids(x, y, grid: StaggeredGrid):
    if not grid.uniform:
        xe = jnp.asarray(grid.x_corner, x.dtype)
        ye = jnp.asarray(grid.y_corner, y.dtype)
        i = jnp.clip(jnp.searchsorted(xe, x, side="right").astype(jnp.int32) - 1,
                     0, grid.nx - 1)
        j = jnp.clip(jnp.searchsorted(ye, y, side="right").astype(jnp.int32) - 1,
                     0, grid.ny - 1)
        return j * grid.nx + i
    i = jnp.clip((x / grid.dx).astype(jnp.int32), 0, grid.nx - 1)
    j = jnp.clip((y / grid.dy).astype(jnp.int32), 0, grid.ny - 1)
    return j * grid.nx + i


def _neighborhood_majority(hist, grid: StaggeredGrid, periodic_x=False):
    """hist: (ncells, nmat) -> majority material over each cell's 3x3
    neighborhood (wrapped in x when ``periodic_x``)."""
    nmat = hist.shape[1]
    h = hist.reshape(grid.ny, grid.nx, nmat)
    hp = jnp.pad(h, ((1, 1), (0, 0), (0, 0)), mode="edge")
    if periodic_x:
        hp = jnp.concatenate([hp[:, -1:], hp, hp[:, :1]], axis=1)
    else:
        hp = jnp.pad(hp, ((0, 0), (1, 1), (0, 0)), mode="edge")
    acc = sum(
        hp[1 + dj : grid.ny + 1 + dj, 1 + di : grid.nx + 1 + di]
        for dj in (-1, 0, 1)
        for di in (-1, 0, 1)
    )
    return jnp.argmax(acc, axis=-1).reshape(-1).astype(jnp.int32)


def reseed_starved(
    markers: MarkerState,
    T_grid,
    grid: StaggeredGrid,
    n_materials: int,
    min_per_cell: int = 2,
    max_moves: int = 256,
    periodic_x: bool = False,
) -> MarkerState:
    ncells = grid.nx * grid.ny
    max_moves = min(max_moves, ncells)
    cid = _cell_ids(markers.x, markers.y, grid)

    counts = jnp.zeros(ncells, jnp.int32).at[cid].add(1)

    # material histogram per cell (nmat is small and static)
    onehot = jnp.zeros((ncells, n_materials), jnp.int32).at[
        cid, markers.mat
    ].add(1)
    majority = _neighborhood_majority(onehot, grid, periodic_x)

    # sorted marker order by cell -> segment starts
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    seg_start = jnp.searchsorted(sorted_cid, jnp.arange(ncells))

    starved_cells = jnp.argsort(counts)[:max_moves]
    donor_cells = jnp.argsort(-counts)[:max_moves]

    need = counts[starved_cells] < min_per_cell
    can_give = counts[donor_cells] > 2 * min_per_cell
    do_move = need & can_give

    donor_marker = order[seg_start[donor_cells]]  # first marker of donor cell

    # destination: starved cell center + deterministic stagger (golden-ratio
    # offsets keep repeated reseeds of the same cell from stacking exactly)
    sj = starved_cells // grid.nx
    si = starved_cells % grid.nx
    k = jnp.arange(max_moves)
    off_x = ((k * 0.381966) % 1.0 - 0.5) * 0.5
    off_y = ((k * 0.618034) % 1.0 - 0.5) * 0.5
    if grid.uniform:
        dst_x = (si + 0.5 + off_x) * grid.dx
        dst_y = (sj + 0.5 + off_y) * grid.dy
    else:
        xe = jnp.asarray(grid.x_corner)
        ye = jnp.asarray(grid.y_corner)
        dxs = jnp.asarray(grid.dxs)
        dys = jnp.asarray(grid.dys)
        dst_x = xe[si] + (0.5 + off_x) * dxs[si]
        dst_y = ye[sj] + (0.5 + off_y) * dys[sj]

    new_x = markers.x.at[donor_marker].set(
        jnp.where(do_move, dst_x.astype(markers.x.dtype), markers.x[donor_marker])
    )
    new_y = markers.y.at[donor_marker].set(
        jnp.where(do_move, dst_y.astype(markers.y.dtype), markers.y[donor_marker])
    )
    T_at_dst = grid_to_markers(T_grid, dst_x, dst_y, grid, "corner",
                               periodic_x=periodic_x)
    new_T = markers.T.at[donor_marker].set(
        jnp.where(do_move, T_at_dst.astype(markers.T.dtype), markers.T[donor_marker])
    )
    new_mat = markers.mat.at[donor_marker].set(
        jnp.where(do_move, majority[starved_cells], markers.mat[donor_marker])
    )
    return MarkerState(x=new_x, y=new_y, mat=new_mat, T=new_T)
