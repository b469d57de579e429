"""Micro-profile of the Stokes phase at the bench configuration.

Times the building blocks of the mixed-precision Stokes solve separately
(f32 saddle apply, MG V-cycle preconditioner application, emulated-f64
saddle apply, FGMRES orthogonalization cost per iteration) so optimization
effort goes where the milliseconds are (SURVEY.md §5 tracing row).

Usage: python scripts/profile_stokes.py [--nx 1024]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from pylamp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    args = ap.parse_args()

    from pylamp_tpu.models.benchmarks import fk_stagnant_lid
    from pylamp_tpu.models.config import SolverConfig
    from pylamp_tpu.models.setup import build
    from pylamp_tpu.models.step import make_step, make_step_phases
    from pylamp_tpu.ops.stokes import stokes_operator, stokes_rhs
    from pylamp_tpu.solvers.mg import make_mg_preconditioner
    from pylamp_tpu.solvers.scaling import characteristic_viscosity, stokes_scales

    cfg = fk_stagnant_lid(nx=args.nx, ny=args.nx, max_steps=10**9)
    solver = SolverConfig(
        stokes_tol=1e-8, stokes_restart=25, stokes_maxiter=250, energy_tol=1e-10,
    )
    cfg = dataclasses.replace(cfg, solver=solver)
    grid, table, state = build(cfg, dtype=jnp.float32)
    step = jax.jit(make_step(grid, cfg, table))
    for _ in range(2):  # get realistic eta/rho fields
        state, diag = step(state)
    print(json.dumps({"iters_per_step": float(diag["stokes_iterations"])}))

    phases = make_step_phases(grid, cfg, table)
    io = jax.jit(phases.interp)(state)
    jax.block_until_ready(io.eta_n)

    f32, f64 = jnp.float32, jnp.float64
    eta_s64 = io.eta_s.astype(f64)
    eta_n64 = io.eta_n.astype(f64)
    eta_char = characteristic_viscosity(eta_n64)
    kcont, kbnd = stokes_scales(eta_char, grid)
    eta_s32, eta_n32 = eta_s64.astype(f32), eta_n64.astype(f32)
    kcont32, kbnd32 = kcont.astype(f32), kbnd.astype(f32)
    vbc = cfg.physics.velocity_bcs

    u32 = (state.vx.astype(f32), state.vy.astype(f32), state.p.astype(f32))
    u64 = tuple(l.astype(f64) for l in u32)

    @jax.jit
    def op32(u):
        vx, vy, p = u
        return stokes_operator(vx, vy, p, eta_s32, eta_n32, grid, vbc,
                               kcont=kcont32, kbnd=kbnd32)

    @jax.jit
    def op64(u):
        vx, vy, p = u
        return stokes_operator(vx, vy, p, eta_s64, eta_n64, grid, vbc,
                               kcont=kcont, kbnd=kbnd)

    M32 = make_mg_preconditioner(
        eta_s32, eta_n32, grid, kcont32, kbnd32, bcs=vbc,
        levels=solver.mg_levels, cycles=solver.mg_cycles,
        pre_smooth=solver.mg_pre_smooth, post_smooth=solver.mg_post_smooth,
        use_pallas=solver.use_pallas,
        use_pallas_smoother=solver.use_pallas_smoother,
        schur=solver.schur,
    )
    Mj = jax.jit(M32)

    # FGMRES per-iteration overhead outside op+M: CGS projection against a
    # growing basis + vector updates.  Approximate with the mean basis
    # depth (restart/2) of axpy-like traffic.
    k = solver.stokes_restart // 2

    @jax.jit
    def ortho(u):
        vx, vy, p = u
        acc = jnp.zeros((), f32)
        ox, oy, op_ = jnp.zeros_like(vx), jnp.zeros_like(vy), jnp.zeros_like(p)
        for i in range(k):
            c = 1.0 + 1e-6 * i
            acc = acc + jnp.vdot(vx, vx * c) + jnp.vdot(vy, vy) + jnp.vdot(p, p)
            ox = ox + c * vx
            oy = oy + c * vy
            op_ = op_ + c * p
        return acc, ox, oy, op_

    res = {
        "nx": args.nx,
        "op32_ms": round(timeit(op32, u32) * 1e3, 3),
        "mg_vcycle_ms": round(timeit(Mj, u32) * 1e3, 3),
        "op64_ms": round(timeit(op64, u64, n=5) * 1e3, 3),
        f"ortho_k{k}_ms": round(timeit(ortho, u32) * 1e3, 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
