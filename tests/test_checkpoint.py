"""Checkpoint / exact-resume (SURVEY.md §5): continuing from a checkpoint
must reproduce the uninterrupted run bit-for-bit."""
import dataclasses
import numpy as np
import jax

from pylamp_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from pylamp_tpu.models.benchmarks import falling_block
from pylamp_tpu.models.config import SolverConfig
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step


def test_exact_resume(tmp_path):
    cfg = falling_block(nx=12, ny=12)
    cfg = dataclasses.replace(cfg, solver=SolverConfig(preconditioner="jacobi",
                                                        stokes_restart=60))
    grid, table, state = build(cfg)
    step = jax.jit(make_step(grid, cfg, table))

    # run 2 steps, checkpoint, run 2 more
    for _ in range(2):
        state, _ = step(state)
    ckpt = str(tmp_path / "ck.npz")
    save_checkpoint(ckpt, state, extra={"note": 1})
    cont = state
    for _ in range(2):
        cont, _ = step(cont)

    # resume from checkpoint and run the same 2 steps (template = a fresh
    # build of the same config, as the driver does)
    _, _, template = build(cfg)
    resumed, extra = load_checkpoint(ckpt, template=template)
    assert int(extra["note"]) == 1
    for _ in range(2):
        resumed, _ = step(resumed)

    for a, b in zip(jax.tree.leaves(cont), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
