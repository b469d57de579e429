"""Chebyshev lambda_max warm-start across steps (solvers/mg.py
estimate_mg_lambdas + ModelState.mg_lam).

The cold path runs 12 power iterations per MG level per solve; the warm
path refreshes with 2 and floors at the previous step's bound.  These
tests pin (a) estimate vs the in-solver power iteration, (b) whole-run
equivalence of solutions with/without the warm-start (same solver
tolerance => same physics), (c) the state plumbing (scan carry, checkpoint
round-trip with the new leaf, old-checkpoint compatibility)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.models.benchmarks import falling_block
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step


def _cfg(nx=32):
    cfg = falling_block(nx=nx, ny=nx)
    return cfg


def test_estimate_matches_cold_power_iteration():
    from pylamp_tpu.core.bc import VelocityBCs
    from pylamp_tpu.core.grid import StaggeredGrid
    from pylamp_tpu.solvers.mg import estimate_mg_lambdas

    grid = StaggeredGrid(nx=32, ny=32, lx=1.0, ly=1.0)
    bcs = VelocityBCs()
    rng = np.random.default_rng(0)
    eta_s = jnp.asarray(10.0 ** rng.uniform(-1, 1, grid.shape_corner))
    eta_n = jnp.asarray(10.0 ** rng.uniform(-1, 1, grid.shape_center))

    cold = estimate_mg_lambdas(eta_s, eta_n, grid, bcs, 1.0)
    assert cold.shape[0] >= 3
    assert bool(jnp.all(cold > 0)) and bool(jnp.all(cold < 4.1))

    # warm refresh with the cold result as hint: floored at 0.995x the hint
    warm = estimate_mg_lambdas(eta_s, eta_n, grid, bcs, 1.0, hint=cold)
    assert bool(jnp.all(warm >= 0.995 * cold - 1e-12))
    assert bool(jnp.all(warm <= 1.2 * cold))


def test_warmstart_run_matches_cold_run():
    """3 steps with the warm-start vs 3 steps with mg_lam disabled (None):
    same physics to solver tolerance."""
    cfg = _cfg()
    grid, table, state = build(cfg, dtype=jnp.float64)
    assert state.mg_lam is not None and state.mg_lam.shape[0] > 0

    step = jax.jit(make_step(grid, cfg, table))
    s_warm = state
    for _ in range(3):
        s_warm, d_warm = step(s_warm)
        assert bool(d_warm["stokes_converged"])
    # lam estimates populated and sane
    assert bool(jnp.all(s_warm.mg_lam > 0))

    s_cold = state.replace(mg_lam=None)
    step_cold = jax.jit(make_step(grid, cfg, table))
    for _ in range(3):
        s_cold, d_cold = step_cold(s_cold)
        assert bool(d_cold["stokes_converged"])

    # both runs solve to 1e-8 relative residual of the same systems
    scale = float(jnp.max(jnp.abs(s_cold.vy)))
    assert float(jnp.max(jnp.abs(s_warm.vy - s_cold.vy))) < 1e-6 * scale
    assert float(jnp.max(jnp.abs(s_warm.vx - s_cold.vx))) < 1e-6 * scale


def test_scan_carry_and_checkpoint_roundtrip(tmp_path):
    from pylamp_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from pylamp_tpu.models.step import make_multi_step

    cfg = _cfg()
    grid, table, state = build(cfg, dtype=jnp.float64)
    multi = jax.jit(make_multi_step(grid, cfg, table, 2))
    state2, diags = multi(state)
    assert bool(jnp.all(state2.mg_lam > 0))

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state2)
    loaded, _ = load_checkpoint(path, template=state)
    assert np.array_equal(np.asarray(loaded.mg_lam), np.asarray(state2.mg_lam))


def test_old_checkpoint_without_mg_lam_loads(tmp_path):
    """Checkpoints written before the mg_lam leaf existed still resume
    (the leaf falls back to the template's zeros = 'recompute')."""
    from pylamp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    cfg = _cfg()
    grid, table, state = build(cfg, dtype=jnp.float64)
    path = str(tmp_path / "old.npz")
    old_style = state.replace(mg_lam=None)
    save_checkpoint(path, old_style)
    loaded, _ = load_checkpoint(path, template=state)
    assert loaded.mg_lam is not None
    assert np.all(np.asarray(loaded.mg_lam) == 0.0)
