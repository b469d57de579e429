"""A/B: periodic falling block on TPU with the Pallas kernels ON vs OFF.

Round-3 verdict item 6: periodic-x runs must keep the TPU-native fast
paths.  The saddle-apply and fused-Chebyshev kernels emit the wrapped
half-convention seam columns (ops/pallas/stokes_kernel.py,
ops/pallas/cheb_kernel.py); the marker kernels have wrapped since round 3.

Checks (a) both variants converge to 1e-8, (b) the states agree to f32
solver roundoff, (c) wall time per step; writes validation/ab_periodic.json.

Usage: python scripts/ab_periodic.py [nx] [steps]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from pylamp_tpu.models.benchmarks import falling_block_periodic
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step
from pylamp_tpu.utils.cache import enable_persistent_cache


def main(nx=512, steps=8, out_dir="validation"):
    enable_persistent_cache()
    results = {}
    for tag, on in [("kernels_on", True), ("kernels_off", False)]:
        cfg = falling_block_periodic(nx=nx, ny=nx, max_steps=steps)
        cfg = dataclasses.replace(
            cfg,
            solver=dataclasses.replace(
                cfg.solver,
                use_pallas_smoother=on, use_pallas_apply=on,
                use_pallas_m2g=on, use_pallas_advect=on,
            ),
        )
        grid, table, state = build(cfg, dtype=jnp.float32)
        step = jax.jit(make_step(grid, cfg, table))
        state, diag = step(state)  # compile + warm
        jax.block_until_ready(state.vx)
        t0 = time.time()
        conv = True
        iters = []
        for _ in range(steps - 1):
            state, diag = step(state)
            jax.block_until_ready(state.vx)
            conv &= bool(diag["stokes_converged"])
            iters.append(int(diag["stokes_iterations"]))
        wall = (time.time() - t0) / (steps - 1)
        results[tag] = dict(
            state=state, s_per_step=wall, converged=conv, iters=iters,
            residual_rel=float(diag["stokes_residual_rel"]),
        )
        print(f"{tag}: {wall*1e3:.1f} ms/step, converged={conv}, "
              f"iters={iters}, rel={results[tag]['residual_rel']:.2e}",
              flush=True)

    a = results["kernels_on"]["state"]
    b = results["kernels_off"]["state"]
    errs = {}
    for name in ("vx", "vy", "T"):
        scale = max(float(jnp.max(jnp.abs(getattr(b, name)))), 1e-30)
        err = float(jnp.max(jnp.abs(getattr(a, name) - getattr(b, name))))
        errs[name] = err / scale
        assert err <= 1e-6 * scale, (name, err, scale)

    summary = {
        "benchmark": "falling_block_periodic_kernel_ab",
        "nx": nx, "steps": steps,
        "s_per_step_kernels_on": round(results["kernels_on"]["s_per_step"], 4),
        "s_per_step_kernels_off": round(results["kernels_off"]["s_per_step"], 4),
        "speedup": round(results["kernels_off"]["s_per_step"]
                         / results["kernels_on"]["s_per_step"], 3),
        "iters_on": results["kernels_on"]["iters"][-1],
        "iters_off": results["kernels_off"]["iters"][-1],
        "all_converged": (results["kernels_on"]["converged"]
                          and results["kernels_off"]["converged"]),
        "max_rel_state_diff": max(errs.values()),
        "device": str(jax.devices()[0]),
    }
    from pylamp_tpu.utils.artifacts import write_json_artifact

    write_json_artifact(os.path.join(out_dir, "ab_periodic.json"), summary)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(nx, steps)
