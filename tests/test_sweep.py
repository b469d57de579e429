"""DP-analogue batched parameter sweep (SURVEY.md §2.3 row 1): a vmapped
Blankenbach Ra sweep must advance every member like its own solo run.

Batched `lax.while_loop`s iterate until the LAST member converges, so
already-converged members keep polishing their solution; batched-vs-solo
agreement is therefore to solver tolerance, not bitwise.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.models.benchmarks import blankenbach_case1a
from pylamp_tpu.models.config import SolverConfig
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step
from pylamp_tpu.models.sweep import (
    make_sweep_step,
    stack_states,
    stack_tables,
    unstack_state,
)
from pylamp_tpu.physics.materials import MaterialTable

RAS = (1e4, 3e4, 1e5, 3e5)


def _cfg(Ra):
    cfg = blankenbach_case1a(nx=16, ny=16, Ra=Ra, max_steps=2)
    return dataclasses.replace(
        cfg, solver=SolverConfig(stokes_tol=1e-10, energy_tol=1e-12)
    )


@pytest.mark.slow
def test_blankenbach_ra_sweep_matches_solo_runs():
    cfgs = [_cfg(Ra) for Ra in RAS]
    built = [build(c, dtype=jnp.float64) for c in cfgs]
    grid = built[0][0]
    tables = [b[1] for b in built]
    states = [b[2] for b in built]

    sweep_step, params = make_sweep_step(grid, cfgs[0], tables)
    batched = stack_states(states)
    for _ in range(2):
        batched, diag_b = sweep_step(batched, params)

    assert diag_b["stokes_converged"].shape == (len(RAS),)
    assert bool(jnp.all(diag_b["stokes_converged"]))

    for i, (cfg, table, state) in enumerate(zip(cfgs, tables, states)):
        step = jax.jit(make_step(grid, cfg, table))
        for _ in range(2):
            state, diag = step(state)
        got = unstack_state(batched, i)
        # batched runs keep iterating after convergence (see module doc):
        # agreement is to solver tolerance
        np.testing.assert_allclose(
            np.asarray(got.T), np.asarray(state.T), rtol=0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.vx), np.asarray(state.vx), rtol=0,
            atol=1e-6 * float(jnp.max(jnp.abs(state.vx)) + 1e-30),
        )
        assert float(got.time) == pytest.approx(float(state.time), rel=1e-10)


def test_stack_tables_rejects_mismatched_materials():
    t1 = stack_tables([MaterialTable(_cfg(1e4).physics.materials)])
    assert t1["rho0"].shape == (1, 1)
    with pytest.raises(ValueError):
        stack_tables(
            [
                MaterialTable(_cfg(1e4).physics.materials),
                MaterialTable(
                    _cfg(1e4).physics.materials + _cfg(1e5).physics.materials
                ),
            ]
        )
