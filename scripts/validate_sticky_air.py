"""Sticky-air free-surface relaxation (BASELINE config 5), Crameri et al.
(2012)-style: an initial 7 km cosine topography on a high-viscosity
lithosphere relaxes toward isostasy; the surface position is tracked through
the air/rock marker interface.  The analytic expectation for this setup
(their case 1 geometry) is near-exponential decay with a relaxation time of
order 10-20 kyr; we fit tau from the amplitude history and check the decay
is smooth and monotonic (no 'drunken sailor' oscillations — the sticky-air
dt limiter must keep the free surface stable).

Defaults to the SPEC resolution (1024x256).  Emits ONE machine-readable
JSON summary line and writes validation/sticky_air_<nx>x<ny>.json +
_amp.jsonl + .png artifacts (round-4: VALIDATION.md rows are backed by
committed records).
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

import numpy as np
import jax.numpy as jnp

from pylamp_tpu.markers.bucket import bucket_markers_to_grid
from pylamp_tpu.models.benchmarks import sticky_air
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step

KYR = 3.15576e10  # seconds


def surface_amplitude(state, grid):
    """Air/rock interface from the marker 'rockness' field: first corner row
    where the column's rock fraction crosses 0.5, linearly interpolated."""
    rock = (state.markers.mat > 0).astype(jnp.float32)
    frac, w = bucket_markers_to_grid(state.markers, rock, grid, "corner")
    frac = np.asarray(jnp.where(w > 0, frac, 0.0))
    ny1, nx1 = frac.shape
    ys = np.linspace(0.0, grid.ly, ny1)
    iface = np.zeros(nx1)
    for i in range(nx1):
        col = frac[:, i]
        idx = np.argmax(col >= 0.5)
        if idx == 0:
            iface[i] = 0.0
            continue
        f0, f1 = col[idx - 1], col[idx]
        t = (0.5 - f0) / max(f1 - f0, 1e-12)
        iface[i] = ys[idx - 1] + t * (ys[idx] - ys[idx - 1])
    dev = iface - iface.mean()
    return 0.5 * (dev.max() - dev.min()), iface


def main(nx=1024, ny=256, n_steps=80, out_dir="validation"):
    # The preset carries the tuned sharp-contrast solver (deep Chebyshev
    # smoothing + loose 10-iteration inner velocity FGMRES); see the
    # tuning matrix recorded in models/benchmarks.py.
    cfg = sticky_air(nx=nx, ny=ny, max_steps=n_steps)
    grid, table, state = build(cfg, dtype=jnp.float32)
    step = jax.jit(make_step(grid, cfg, table))

    os.makedirs(out_dir, exist_ok=True)
    tag = f"sticky_air_{nx}x{ny}"
    series = open(os.path.join(out_dir, f"{tag}_amp.jsonl"), "w")

    t0 = time.time()
    amp0, _ = surface_amplitude(state, grid)
    print(f"t=0: amplitude={amp0/1e3:.3f} km", flush=True)
    hist = [(0.0, amp0)]
    all_converged = True
    iters = []
    for n in range(1, n_steps + 1):
        state, diag = step(state)
        if n == 1:
            # timing excludes the first (compile) step
            import jax as _jax

            _jax.block_until_ready(state.vx)
            t0 = time.time()
        iters.append(int(diag["stokes_iterations"]))
        all_converged &= bool(diag["stokes_converged"])
        if n % 5 == 0 or n == n_steps:
            amp, _ = surface_amplitude(state, grid)
            t_kyr = float(state.time) / KYR
            hist.append((t_kyr, amp))
            series.write(json.dumps({
                "step": n, "t_kyr": t_kyr, "amp_m": float(amp),
                "iters": int(diag["stokes_iterations"]),
                "converged": bool(diag["stokes_converged"]),
            }) + "\n")
            print(
                f"step {n} t={t_kyr:.2f} kyr amp={amp/1e3:.3f} km "
                f"iters={int(diag['stokes_iterations'])} "
                f"conv={bool(diag['stokes_converged'])} "
                f"dt={float(diag['dt'])/KYR:.3f} kyr wall={time.time()-t0:.0f}s",
                flush=True,
            )
    series.close()

    ts = np.array([h[0] for h in hist])
    amps = np.array([h[1] for h in hist])
    # fit tau over the portion with meaningful amplitude
    sel = amps > 0.2 * amps[0]
    if sel.sum() > 3:
        tau = -1.0 / np.polyfit(ts[sel], np.log(amps[sel] / amps[0]), 1)[0]
    else:
        tau = float("nan")
    mono = bool(np.all(np.diff(amps) < 0.05 * amps[0]))
    wall = time.time() - t0
    summary = {
        "benchmark": "crameri_2012_style_sticky_air",
        "nx": nx, "ny": ny, "steps": n_steps,
        "amp0_km": float(amps[0] / 1e3),
        "amp_final_km": float(amps[-1] / 1e3),
        "tau_kyr": float(tau),
        "tau_expected_band_kyr": [10.0, 20.0],
        "monotonic_decay": mono,
        "all_converged": all_converged,
        "iters_min": int(min(iters)), "iters_max": int(max(iters)),
        "iters_mean": round(float(np.mean(iters)), 1),
        "seconds_per_step": round(wall / max(n_steps - 1, 1), 3),
        "device": str(jax.devices()[0]),
    }
    from pylamp_tpu.utils.artifacts import write_json_artifact

    write_json_artifact(os.path.join(out_dir, f"{tag}.json"), summary)
    print(json.dumps(summary), flush=True)
    print(
        f"FINAL {nx}x{ny}: amplitude {amps[0]/1e3:.2f} -> {amps[-1]/1e3:.3f} km, "
        f"fitted tau = {tau:.1f} kyr (Crameri-type setups: O(10-20) kyr), "
        f"monotonic-decay={mono}, wall={wall:.0f}s",
        flush=True,
    )
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.semilogy(ts, amps / 1e3, "o-", lw=1.2, ms=3,
                    label=f"pylamp_tpu {nx}x{ny}")
        ax.semilogy(ts, amps[0] / 1e3 * np.exp(-ts / tau), "--",
                    label=f"exp fit tau={tau:.1f} kyr")
        ax.set_xlabel("t [kyr]")
        ax.set_ylabel("topography amplitude [km]")
        ax.legend()
        ax.set_title("Sticky-air free-surface relaxation — BASELINE config 5")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{tag}.png"), dpi=110)
    except Exception as e:
        print(f"figure skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ns = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    main(nx, ny, ns)
