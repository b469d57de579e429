"""Marker reseeding: starved cells get repopulated from crowded donors with
the neighborhood-majority material and grid-interpolated temperature."""
import numpy as np
import jax.numpy as jnp

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.reseed import reseed_starved, _cell_ids
from pylamp_tpu.markers.state import MarkerState


def test_reseed_fills_starved_cell():
    grid = StaggeredGrid(nx=4, ny=4, lx=1.0, ly=1.0)
    rng = np.random.default_rng(0)
    # 9 markers/cell everywhere except cell (1,1) emptied; markers piled in
    # cell (3,3)
    xs, ys = [], []
    for j in range(4):
        for i in range(4):
            if (j, i) == (1, 1):
                continue
            xs.extend((i + rng.uniform(0.1, 0.9, 9)) * 0.25)
            ys.extend((j + rng.uniform(0.1, 0.9, 9)) * 0.25)
    # extra pile in (3,3)
    xs.extend((3 + rng.uniform(0.1, 0.9, 9)) * 0.25)
    ys.extend((3 + rng.uniform(0.1, 0.9, 9)) * 0.25)
    x = jnp.asarray(xs)
    y = jnp.asarray(ys)
    mat = jnp.ones(x.shape[0], jnp.int32)  # all material 1
    T = jnp.zeros_like(x)
    markers = MarkerState(x=x, y=y, mat=mat, T=T)

    T_grid = jnp.broadcast_to(
        jnp.linspace(0, 1, grid.ny + 1)[:, None], grid.shape_corner
    )  # T = y

    n0 = markers.n
    out = reseed_starved(markers, T_grid, grid, n_materials=2,
                         min_per_cell=2, max_moves=8)

    assert out.n == n0  # population conserved (moves, not inserts)
    cid = np.asarray(_cell_ids(out.x, out.y, grid))
    counts = np.bincount(cid, minlength=16)
    starved_cell = 1 * 4 + 1
    assert counts[starved_cell] >= 1  # got repopulated
    # moved marker carries majority material and T from the grid
    in_cell = cid == starved_cell
    assert np.all(np.asarray(out.mat)[in_cell] == 1)
    expected_T = np.asarray(out.y)[in_cell]  # T = y field
    np.testing.assert_allclose(np.asarray(out.T)[in_cell], expected_T, atol=1e-6)


def test_reseed_noop_when_healthy():
    grid = StaggeredGrid(nx=4, ny=4, lx=1.0, ly=1.0)
    rng = np.random.default_rng(1)
    xs, ys = [], []
    for j in range(4):
        for i in range(4):
            xs.extend((i + rng.uniform(0.1, 0.9, 9)) * 0.25)
            ys.extend((j + rng.uniform(0.1, 0.9, 9)) * 0.25)
    x = jnp.asarray(xs)
    y = jnp.asarray(ys)
    markers = MarkerState(x=x, y=y, mat=jnp.zeros(x.shape[0], jnp.int32),
                          T=jnp.zeros_like(x))
    T_grid = jnp.zeros(grid.shape_corner)
    out = reseed_starved(markers, T_grid, grid, n_materials=1,
                         min_per_cell=2, max_moves=8)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(out.y), np.asarray(y))
