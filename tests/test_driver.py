"""Driver-level behavior: divergence retry (SURVEY.md §5 failure
detection) and metrics output."""
import dataclasses
import json
import os

from pylamp_tpu.models.benchmarks import falling_block
from pylamp_tpu.models.config import SolverConfig
from pylamp_tpu.models.driver import run_model


def test_divergence_retry_and_metrics(tmp_path):
    cfg = falling_block(nx=12, ny=12, max_steps=2)
    # deliberately starve the solver so every step fails first; the 4x
    # retry budget is enough for the MG-preconditioned solve
    cfg = dataclasses.replace(
        cfg, solver=SolverConfig(preconditioner="mg", stokes_maxiter=5,
                                 stokes_restart=5)
    )
    out = str(tmp_path)
    state, diags, grid = run_model(cfg, out_dir=out)
    assert int(state.step) == 2
    assert all(bool(d.get("retried", False)) for d in diags)
    assert all(bool(d["stokes_converged"]) for d in diags)

    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[-1])
    assert rec["step"] == 2 and "vrms" in rec and "dt" in rec
