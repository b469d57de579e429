"""Fault injection: SIGKILL a run mid-flight, resume from its checkpoint,
and require the final state to match an uninterrupted run to 1e-12
(SURVEY.md §5 failure-detection row — the crash path itself, not just the
checkpoint round-trip that tests/test_checkpoint.py covers).

The victim is a real subprocess running the CLI driver (the production
crash surface).  Robustness against loaded runners (round-3 verdict: the
wall-clock kill window flaked in a full-suite run):

- the victim runs with ``--step-delay`` so the between-steps kill window
  has a deterministic width, independent of compile speed or machine load;
- the kill deadline is scaled from the measured wall time of the
  uninterrupted reference run (which also warms the shared persistent
  XLA compile cache for the victim);
- if the window is still missed, the victim is retried once before the
  test gives up.
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}
BASE = [
    sys.executable, "-m", "pylamp_tpu", "run", "falling_block",
    "--nx", "16", "--x64", "--checkpoint-every", "1",
]
STEP_DELAY = 0.5  # seconds of sleep after every victim step


def _run(args, timeout=2400):
    return subprocess.run(
        BASE + args, cwd=REPO, env=ENV, timeout=timeout,
        capture_output=True, text=True,
    )


def _final_metrics(out_dir):
    with open(os.path.join(out_dir, "metrics.jsonl")) as fh:
        return [json.loads(l) for l in fh]


def _metrics_lines(out_dir):
    path = os.path.join(out_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return 0
    with open(path) as fh:
        return sum(1 for _ in fh)


def _kill_mid_run(crash_dir, deadline_s):
    """Start a victim run and SIGKILL it once the step-3 checkpoint exists.
    Returns True if the kill landed mid-run (a checkpoint exists and the
    run is incomplete)."""
    ck = os.path.join(crash_dir, "checkpoint.npz")
    p = subprocess.Popen(
        BASE + ["--steps", "6", "--out", crash_dir,
                "--step-delay", str(STEP_DELAY)],
        cwd=REPO, env=ENV,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + deadline_s
    killed = False
    while time.time() < deadline:
        if p.poll() is not None:
            break  # finished before we could kill it
        if _metrics_lines(crash_dir) >= 3 and os.path.exists(ck):
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.05)
    if p.poll() is None:
        # deadline expired with the victim still running (extreme load):
        # kill it anyway — if it got past step 3 the crash path is still
        # exercised, otherwise the caller retries
        p.send_signal(signal.SIGKILL)
    p.wait(timeout=120)
    return (killed or _metrics_lines(crash_dir) >= 3) and (
        os.path.exists(ck) and _metrics_lines(crash_dir) < 6
    )


@pytest.mark.slow
def test_kill_and_resume_matches_uninterrupted(tmp_path):
    ref_dir = str(tmp_path / "ref")

    # uninterrupted reference: 6 steps.  Also warms the persistent XLA
    # compile cache (.jax_cache) that the victim process reuses.
    t0 = time.time()
    r = _run(["--steps", "6", "--out", ref_dir])
    ref_wall = time.time() - t0
    assert r.returncode == 0, r.stderr[-2000:]

    # kill window: the victim pays at most the reference's wall (compile
    # cache warm) plus 6 x step_delay; budget several times that
    deadline_s = max(300.0, 5.0 * ref_wall)
    killed = False
    crash_dir = None
    for attempt in range(2):
        crash_dir = str(tmp_path / f"crash{attempt}")
        if _kill_mid_run(crash_dir, deadline_s):
            killed = True
            break
    assert killed, (
        f"could not land a mid-run SIGKILL in {deadline_s:.0f}s x2 — "
        f"runner too loaded even for the widened window"
    )

    # resume from the crash checkpoint and run out the clock
    ck = os.path.join(crash_dir, "checkpoint.npz")
    r = _run(["--steps", "6", "--out", crash_dir, "--resume", ck])
    assert r.returncode == 0, r.stderr[-2000:]

    ref = _final_metrics(ref_dir)
    got = _final_metrics(crash_dir)
    # the resumed run's metrics file contains pre-crash + post-resume lines;
    # compare the final step's physics scalars.  Checkpoint round-trips are
    # bitwise (tests/test_checkpoint.py), but separate PROCESSES can
    # compile marginally different XLA binaries — measured 1-2 ULP
    # differences in f64 across an otherwise identical resume — so the
    # cross-process comparison uses a 1e-12 relative tolerance.
    rf, gf = ref[-1], got[-1]
    assert gf["step"] == rf["step"]
    for key in ("time", "vrms", "vmax", "dt"):
        a, b = np.float64(gf[key]), np.float64(rf[key])
        assert abs(a - b) <= 1e-12 * max(abs(a), abs(b)), (key, a, b)
