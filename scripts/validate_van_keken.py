"""van Keken et al. (1997) isothermal Rayleigh-Taylor benchmark (BASELINE
config 4): track v_rms(t); the isoviscous case peaks at v_rms ~ 3.09e-3
around t ~ 209 (published community values for case 1a).

Defaults to the SPEC resolution (512^2).  Emits ONE machine-readable JSON
summary line and, with --out (default validation/), writes
  van_keken_<nx>.json        the summary
  van_keken_<nx>_vrms.jsonl  per-step t / vrms / iters / dropped
  van_keken_<nx>.png         vrms(t) vs the published peak
so the claims in VALIDATION.md are backed by committed artifacts.

Usage: python scripts/validate_van_keken.py [nx] [t_end] [--out DIR]
"""
import json
import os
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


def main(nx=512, t_end=400.0, out_dir="validation"):
    cfg = rt_van_keken(nx=nx, ny=nx, max_steps=10**9)
    cfg = dataclasses.replace(
        cfg,
        physics=dataclasses.replace(cfg.physics, reseed_min_per_cell=2),
        solver=SolverConfig(stokes_tol=1e-8, stokes_restart=40, stokes_maxiter=200),
        time=dataclasses.replace(cfg.time, courant=0.5, dt_max=2.0),
    )
    grid, table, state = build(cfg, dtype=jnp.float32)
    step = jax.jit(make_step(grid, cfg, table))

    os.makedirs(out_dir, exist_ok=True)
    series_path = os.path.join(out_dir, f"van_keken_{nx}_vrms.jsonl")
    series = open(series_path, "w")

    t0 = time.time()
    peak_v, peak_t, n = 0.0, 0.0, 0
    ts, vs = [], []
    all_converged = True
    iters_total = 0
    while float(state.time) < t_end:
        state, diag = step(state)
        n += 1
        vr = float(vrms_box(state.vx, state.vy))
        tnow = float(state.time)
        ts.append(tnow)
        vs.append(vr)
        iters_total += int(diag["stokes_iterations"])
        all_converged &= bool(diag["stokes_converged"])
        series.write(json.dumps({
            "step": n, "t": tnow, "vrms": vr,
            "iters": int(diag["stokes_iterations"]),
            "converged": bool(diag["stokes_converged"]),
            "dropped": int(diag.get("markers_dropped", 0)),
        }) + "\n")
        if vr > peak_v:
            peak_v, peak_t = vr, tnow
        if n % 100 == 0:
            print(
                f"step {n} t={tnow:.1f} vrms={vr:.5e} "
                f"iters={int(diag['stokes_iterations'])} "
                f"wall={time.time()-t0:.0f}s",
                flush=True,
            )
        # stop once clearly past the peak
        if peak_v > 1e-3 and vr < 0.6 * peak_v:
            break
    series.close()

    err_v = abs(peak_v - VAN_KEKEN_VRMS_PEAK) / VAN_KEKEN_VRMS_PEAK
    err_t = abs(peak_t - VAN_KEKEN_T_PEAK) / VAN_KEKEN_T_PEAK
    wall = time.time() - t0
    summary = {
        "benchmark": "van_keken_1997_case1a",
        "nx": nx,
        "vrms_peak": peak_v,
        "t_peak": peak_t,
        "ref_vrms_peak": VAN_KEKEN_VRMS_PEAK,
        "ref_t_peak": VAN_KEKEN_T_PEAK,
        "err_vrms_rel": err_v,
        "err_t_rel": err_t,
        "steps": n,
        "iters_per_step": round(iters_total / max(n, 1), 1),
        "all_converged": all_converged,
        "seconds_per_step": round(wall / max(n, 1), 4),
        "device": str(jax.devices()[0]),
    }
    from pylamp_tpu.utils.artifacts import write_json_artifact

    write_json_artifact(os.path.join(out_dir, f"van_keken_{nx}.json"), summary)
    print(json.dumps(summary), flush=True)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(ts, vs, lw=1.2, label=f"pylamp_tpu {nx}$^2$")
        ax.plot([VAN_KEKEN_T_PEAK], [VAN_KEKEN_VRMS_PEAK], "r*", ms=12,
                label="van Keken (1997) peak")
        ax.set_xlabel("t")
        ax.set_ylabel("v_rms")
        ax.legend()
        ax.set_title("Rayleigh-Taylor v_rms(t) — BASELINE config 4")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"van_keken_{nx}.png"), dpi=110)
    except Exception as e:  # matplotlib optional
        print(f"figure skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = "validation"
    for a in sys.argv[1:]:
        if a.startswith("--out"):
            out = a.split("=", 1)[1] if "=" in a else "validation"
    nx = int(args[0]) if len(args) > 0 else 512
    t_end = float(args[1]) if len(args) > 1 else 400.0
    main(nx, t_end, out)
