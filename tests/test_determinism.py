"""Determinism (SURVEY.md §5 'race detection' analogue for a data-parallel
accelerator code): identical seeds must give bitwise-identical trajectories."""
import dataclasses

import numpy as np
import jax

from pylamp_tpu.models.benchmarks import falling_block
from pylamp_tpu.models.config import SolverConfig
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step


def _run(n_steps=3):
    cfg = falling_block(nx=16, ny=16)
    cfg = dataclasses.replace(
        cfg, solver=SolverConfig(preconditioner="jacobi", stokes_restart=60,
                                 stokes_maxiter=500, stokes_tol=1e-8)
    )
    grid, table, state = build(cfg)
    step = jax.jit(make_step(grid, cfg, table))
    for _ in range(n_steps):
        state, _ = step(state)
    return state


def test_same_seed_bitwise_reproducible():
    a = _run()
    b = _run()
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
