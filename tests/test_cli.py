"""CLI precision wiring.

Regression test for a silent-truncation bug caught on v5e: the run
subcommand only enabled jax x64 when --x64/--f32 was passed, so the
DEFAULT mixed-precision path built an "f64" state that truncated to f32
and the refinement loop floored at ~6e-7 relative — every step warned
"did not reach tolerance" while the math quietly ran pure f32.  The CLI
must always enable x64 and pass an explicit state dtype to run_model.
"""
import sys
import types

import jax
import jax.numpy as jnp

import pylamp_tpu.models.driver as driver_mod
from pylamp_tpu.cli import main


def _run_cli(monkeypatch, argv):
    captured = {}

    def fake_run_model(cfg, **kw):
        captured.update(kw)
        captured["cfg"] = cfg
        state = types.SimpleNamespace(step=0, time=0.0)
        return state, [], None

    monkeypatch.setattr(driver_mod, "run_model", fake_run_model)
    monkeypatch.setattr(sys, "argv", ["pylamp_tpu"] + argv)
    assert main() == 0
    return captured


def test_default_run_is_f32_state_with_x64_enabled(monkeypatch):
    cap = _run_cli(monkeypatch, ["run", "falling_block", "--nx", "16",
                                 "--steps", "1"])
    assert jax.config.jax_enable_x64, "mixed precision requires x64"
    assert cap["dtype"] == jnp.float32


def test_x64_flag_selects_f64_state(monkeypatch):
    cap = _run_cli(monkeypatch, ["run", "falling_block", "--nx", "16",
                                 "--steps", "1", "--x64"])
    assert jax.config.jax_enable_x64
    assert cap["dtype"] == jnp.float64


def test_run_model_default_dtype_tracks_x64(monkeypatch):
    # with x64 on (the test session default), run_model's dtype=None
    # resolves to f64; the CLI passes dtype explicitly so state precision
    # never depends on import-order side effects.
    seen = {}

    def fake_build(cfg, dtype=jnp.float64):
        seen["dtype"] = dtype
        raise RuntimeError("stop after build")

    monkeypatch.setattr(driver_mod, "build", fake_build)
    from pylamp_tpu.models.benchmarks import falling_block

    cfg = falling_block(nx=16, ny=16, max_steps=1)
    try:
        driver_mod.run_model(cfg)
    except RuntimeError:
        pass
    assert seen["dtype"] == jnp.float64
