"""Shear / adiabatic heating terms (optional energy sources)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.physics.heating import adiabatic_heating, shear_heating


def test_shear_heating_uniform_shear():
    """vx = y (simple shear): e_xy = 1/2, e_xx = 0 -> H_s = 4*eta*(1/4) = eta."""
    grid = StaggeredGrid(nx=8, ny=8, lx=1.0, ly=1.0)
    bcs = VelocityBCs()  # free-slip ghosts preserve dvx/dy at walls? No —
    # mirrors flatten the gradient at walls; check the interior only.
    Yvx = np.tile(grid.y_center[:, None], (1, grid.nx + 1))
    vx = jnp.asarray(Yvx)
    vy = jnp.zeros(grid.shape_vy)
    eta_n = jnp.full(grid.shape_center, 3.0)
    hs = np.asarray(shear_heating(vx, vy, eta_n, grid, bcs))
    np.testing.assert_allclose(hs[2:-2, 2:-2], 3.0, rtol=1e-10)


def test_adiabatic_heating_sign():
    """Downward motion (vy > 0, y down) with T > 0 heats."""
    grid = StaggeredGrid(nx=6, ny=6, lx=1.0, ly=1.0)
    T = jnp.ones(grid.shape_corner) * 2.0
    ra = jnp.ones(grid.shape_corner) * 5.0
    vy = jnp.ones(grid.shape_vy) * 0.1
    ha = np.asarray(adiabatic_heating(T, ra, vy, 9.81, grid))
    np.testing.assert_allclose(ha, 5.0 * 2.0 * 9.81 * 0.1, rtol=1e-12)


def test_step_with_heating_runs():
    from pylamp_tpu.models.benchmarks import blankenbach_case1a
    from pylamp_tpu.models.config import SolverConfig
    from pylamp_tpu.models.setup import build
    from pylamp_tpu.models.step import make_step

    cfg = blankenbach_case1a(nx=12, ny=12, max_steps=2)
    cfg = dataclasses.replace(
        cfg,
        physics=dataclasses.replace(
            cfg.physics, shear_heating=True, adiabatic_heating=True
        ),
        solver=SolverConfig(preconditioner="jacobi", stokes_restart=60,
                            stokes_maxiter=1500),
    )
    grid, table, state = build(cfg)
    step = jax.jit(make_step(grid, cfg, table))
    for _ in range(2):
        state, diag = step(state)
    assert np.isfinite(float(diag["T_mean"]))
