"""van Keken et al. (1997) isothermal Rayleigh-Taylor benchmark (BASELINE
config 4): track v_rms(t); the isoviscous case peaks at v_rms ~ 3.09e-3
around t ~ 209 (published community values for case 1a).

Usage: python scripts/validate_van_keken.py [nx] [t_end]
"""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

from pylamp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import dataclasses
import jax.numpy as jnp

from pylamp_tpu.models.benchmarks import rt_van_keken, vrms_box
from pylamp_tpu.models.config import SolverConfig
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step

VAN_KEKEN_VRMS_PEAK = 3.0916e-3
VAN_KEKEN_T_PEAK = 208.99


def main(nx=256, t_end=400.0):
    cfg = rt_van_keken(nx=nx, ny=nx, max_steps=10**9)
    cfg = dataclasses.replace(
        cfg,
        physics=dataclasses.replace(cfg.physics, reseed_min_per_cell=2),
        solver=SolverConfig(stokes_tol=1e-8, stokes_restart=40, stokes_maxiter=200),
        time=dataclasses.replace(cfg.time, courant=0.5, dt_max=2.0),
    )
    grid, table, state = build(cfg, dtype=jnp.float32)
    step = jax.jit(make_step(grid, cfg, table))

    t0 = time.time()
    peak_v, peak_t, n = 0.0, 0.0, 0
    while float(state.time) < t_end:
        state, diag = step(state)
        n += 1
        vr = float(vrms_box(state.vx, state.vy))
        if vr > peak_v:
            peak_v, peak_t = vr, float(state.time)
        if n % 100 == 0:
            print(
                f"step {n} t={float(state.time):.1f} vrms={vr:.5e} "
                f"iters={int(diag['stokes_iterations'])} "
                f"dropped={int(diag.get('markers_dropped', 0))} "
                f"wall={time.time()-t0:.0f}s",
                flush=True,
            )
        # stop once clearly past the peak
        if peak_v > 1e-3 and vr < 0.6 * peak_v:
            break

    err_v = abs(peak_v - VAN_KEKEN_VRMS_PEAK) / VAN_KEKEN_VRMS_PEAK
    err_t = abs(peak_t - VAN_KEKEN_T_PEAK) / VAN_KEKEN_T_PEAK
    print(
        f"FINAL nx={nx}: vrms_peak={peak_v:.5e} at t={peak_t:.1f} "
        f"(ref {VAN_KEKEN_VRMS_PEAK:.4e} at t={VAN_KEKEN_T_PEAK}; "
        f"errs {err_v:.2%} / {err_t:.2%}) steps={n} wall={time.time()-t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 400.0
    main(nx, t_end)
