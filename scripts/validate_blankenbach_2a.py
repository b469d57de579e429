"""Blankenbach et al. (1989) case 2a: temperature-dependent viscosity
convection, Ra0 = 1e4 (top-viscosity Rayleigh number), viscosity ratio 1e3
(eta = exp(-ln(1e3) T)).  Published steady-state community values:
Nu = 10.066, v_rms = 480.43.  Exercises the Frank-Kamenetskii rheology path
against exact numbers (config 3's law with case-2a parameters).

Usage: python scripts/validate_blankenbach_2a.py [nx] [max_time]
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

from pylamp_tpu.models.benchmarks import fk_stagnant_lid, nusselt_bottom, nusselt_top, vrms_box
from pylamp_tpu.models.config import SolverConfig
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step

BB2A_NU = 10.066
BB2A_VRMS = 480.43


def main(nx=64, max_time=0.2, max_wall_s=0.0):
    cfg = fk_stagnant_lid(nx=nx, ny=nx, Ra_top=1e4, visc_contrast=1e3,
                          max_steps=10**9, max_time=max_time)
    cfg = dataclasses.replace(
        cfg,
        solver=SolverConfig(stokes_tol=1e-8, stokes_restart=40,
                            stokes_maxiter=300, energy_tol=1e-10),
    )
    grid, table, state = build(cfg, dtype=jnp.float32)
    step = jax.jit(make_step(grid, cfg, table))

    t0 = time.time()
    n = 0
    last_nu = -1.0
    steady = False
    while float(state.time) < max_time:
        state, diag = step(state)
        n += 1
        if max_wall_s and time.time() - t0 > max_wall_s:
            print("wall cap reached", flush=True)
            break
        if n % 500 == 0:
            nu = float(nusselt_top(state.T, grid))
            vr = float(vrms_box(state.vx, state.vy))
            print(
                f"step {n} t={float(state.time):.4f} Nu={nu:.4f} vrms={vr:.2f} "
                f"iters={int(diag['stokes_iterations'])} wall={time.time()-t0:.0f}s",
                flush=True,
            )
            if abs(nu - last_nu) < 2e-4 and n > 3000:
                print("steady state reached", flush=True)
                steady = True
                break
            last_nu = nu

    nu = float(nusselt_top(state.T, grid))
    nub = float(nusselt_bottom(state.T, grid))
    vr = float(vrms_box(state.vx, state.vy))
    print(
        f"FINAL nx={nx}: Nu_top={nu:.4f} Nu_bot={nub:.4f} (ref {BB2A_NU}, "
        f"err {abs(nu-BB2A_NU)/BB2A_NU:.2%}) vrms={vr:.2f} (ref {BB2A_VRMS}, "
        f"err {abs(vr-BB2A_VRMS)/BB2A_VRMS:.2%}) steps={n} wall={time.time()-t0:.0f}s",
        flush=True,
    )

    from pylamp_tpu.utils.artifacts import write_json_artifact

    write_json_artifact("validation/blankenbach_2a.json", {
        "config": "Blankenbach 1989 case 2a (T-dep viscosity, Ra0=1e4, "
                  "contrast 1e3)",
        "nx": nx, "steps": n, "time_nondim": float(state.time),
        "steady_state": steady,
        "nu_top": nu, "nu_bottom": nub,
        "nu_ref": BB2A_NU, "nu_rel_err": abs(nu - BB2A_NU) / BB2A_NU,
        "nu_top_bottom_gap": abs(nu - nub) / BB2A_NU,
        "vrms": vr, "vrms_ref": BB2A_VRMS,
        "vrms_rel_err": abs(vr - BB2A_VRMS) / BB2A_VRMS,
        "wall_s": round(time.time() - t0, 1),
        "device": str(jax.devices()[0]),
    })
    print("wrote validation/blankenbach_2a.json", flush=True)


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mt = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    mw = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    main(nx, mt, mw)
