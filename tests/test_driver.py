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


def test_scanned_driver_matches_stepwise(tmp_path):
    """scan_chunk > 0 (lax.scan fused chunks, one host sync per chunk) must
    reproduce the step-by-step driver and still emit per-step metrics."""
    import numpy as np

    cfg = falling_block(nx=12, ny=12, max_steps=4)
    s_ref, d_ref, _ = run_model(cfg, on_divergence="warn")
    out = str(tmp_path)
    s_scan, d_scan, _ = run_model(cfg, out_dir=out, on_divergence="warn",
                                  scan_chunk=2)
    assert int(s_scan.step) == 4
    assert len(d_scan) == 4
    np.testing.assert_allclose(
        np.asarray(s_scan.vy), np.asarray(s_ref.vy), rtol=0, atol=1e-13
    )
    np.testing.assert_allclose(
        float(s_scan.time), float(s_ref.time), rtol=1e-13
    )
    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 4
    rec = json.loads(lines[-1])
    assert rec["step"] == 4 and "dt" in rec and "time" in rec
