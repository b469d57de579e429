"""Frank-Kamenetskii stagnant-lid validation (BASELINE config 3): with
gamma = ln(1e4) and Ra(top) = 10 (Ra_bottom = 1e5) convection must sit in
the stagnant-lid regime: a nearly immobile cold lid over a convecting
interior.  Diagnostics: Nu, v_rms, and surface mobility
M = v_rms(surface) / v_rms(volume)  (stagnant lid: M << 1; Solomatov 1995).
"""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

from pylamp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import dataclasses
import numpy as np
import jax.numpy as jnp

from pylamp_tpu.models.benchmarks import fk_stagnant_lid, nusselt_top, vrms_box
from pylamp_tpu.models.config import SolverConfig
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step


def main(nx=64, max_time=2.0):
    cfg = fk_stagnant_lid(nx=nx, ny=nx, max_steps=10**9, max_time=max_time)
    cfg = dataclasses.replace(
        cfg,
        solver=SolverConfig(stokes_tol=1e-8, stokes_restart=40, stokes_maxiter=200),
    )
    grid, table, state = build(cfg, dtype=jnp.float32)
    step = jax.jit(make_step(grid, cfg, table))

    t0 = time.time()
    n = 0
    last_nu = -1.0
    while float(state.time) < max_time:
        state, diag = step(state)
        n += 1
        if n % 200 == 0:
            nu = float(nusselt_top(state.T, grid))
            vr = float(vrms_box(state.vx, state.vy))
            v_surf = float(jnp.sqrt(jnp.mean(state.vx[0, :] ** 2)))
            print(
                f"step {n} t={float(state.time):.4f} Nu={nu:.4f} vrms={vr:.3f} "
                f"v_surf={v_surf:.4f} iters={int(diag['stokes_iterations'])} "
                f"wall={time.time()-t0:.0f}s",
                flush=True,
            )
            if abs(nu - last_nu) < 5e-5 and n > 2000:
                break
            last_nu = nu

    nu = float(nusselt_top(state.T, grid))
    vr = float(vrms_box(state.vx, state.vy))
    v_surf = float(jnp.sqrt(jnp.mean(state.vx[0, :] ** 2)))
    mobility = v_surf / vr
    print(
        f"FINAL nx={nx}: Nu={nu:.4f} vrms={vr:.3f} v_surf={v_surf:.5f} "
        f"mobility={mobility:.2e} (stagnant lid expects << 1) steps={n} "
        f"wall={time.time()-t0:.0f}s",
        flush=True,
    )

    from pylamp_tpu.utils.artifacts import write_json_artifact

    write_json_artifact("validation/fk_lid.json", {
        "config": "BASELINE config 3 (Frank-Kamenetskii stagnant lid, "
                  "1e4 viscosity contrast)",
        "nx": nx, "steps": n, "time_nondim": float(state.time),
        "nu_top": nu, "vrms": vr, "v_surf_rms": v_surf,
        "mobility": mobility,
        "stagnant_lid": bool(mobility < 0.05),
        "wall_s": round(time.time() - t0, 1),
        "device": str(jax.devices()[0]),
    })
    print("wrote validation/fk_lid.json", flush=True)


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mt = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    main(nx, mt)
