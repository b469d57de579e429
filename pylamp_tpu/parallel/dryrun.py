"""Multi-chip dry run: jit the FULL timestep over an n-device mesh with the
production shardings and execute one step on tiny shapes (SURVEY.md §4
'Distributed' tier; run by the driver on virtual CPU devices)."""
from __future__ import annotations

import dataclasses

import jax
import numpy as np


def dryrun_multichip(n_devices: int) -> None:
    import jax.numpy as jnp

    # jax 0.9 ignores --xla_force_host_platform_device_count; virtual CPU
    # devices come from jax_num_cpu_devices, which must be set BEFORE the
    # backend initializes (so before any jax.devices() call).
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:
        pass  # backend already initialized — fall through to the check
    jax.config.update("jax_enable_x64", True)  # equivalence checked in f64
    devs = jax.devices()
    assert len(devs) >= n_devices, (
        f"need {n_devices} devices, have {len(devs)} — set jax_num_cpu_devices "
        f"before first backend use"
    )

    from pylamp_tpu.models.benchmarks import blankenbach_case1a
    from pylamp_tpu.models.config import SolverConfig
    from pylamp_tpu.models.setup import build
    from pylamp_tpu.models.step import make_step
    from pylamp_tpu.parallel.mesh import make_mesh, shard_state, state_shardings

    # Flagship physics (Stokes + energy + markers) on a tiny grid; the
    # sharding layout is resolution-independent.
    cfg = blankenbach_case1a(nx=32, ny=32, max_steps=1)
    cfg = dataclasses.replace(
        cfg,
        solver=SolverConfig(
            precision="f64",
            stokes_tol=1e-10,
            stokes_restart=40,
            stokes_maxiter=400,
            mg_levels=2,
        ),
    )
    grid, table, state0 = build(cfg, dtype=jnp.float64)
    step_fn = make_step(grid, cfg, table)

    # single-device reference for the equivalence check
    ref_state, _ = jax.jit(step_fn)(state0)
    jax.block_until_ready(ref_state.vx)

    mesh = make_mesh(n_devices)
    state = shard_state(state0, mesh)
    shardings = state_shardings(mesh, state0)

    step = jax.jit(step_fn, in_shardings=(shardings,))
    new_state, diag = step(state)
    jax.block_until_ready(new_state.vx)

    assert bool(diag["stokes_converged"]), "sharded Stokes solve did not converge"
    # strong check: sharded result == single-device result (both solved to
    # 1e-10; the collectives' reduction order may differ at roundoff)
    vref = max(float(jnp.max(jnp.abs(ref_state.vy))), 1.0)
    for name in ("vx", "vy", "T"):
        a = np.asarray(getattr(new_state, name))
        b = np.asarray(getattr(ref_state, name))
        assert np.all(np.isfinite(a)), f"non-finite {name} in sharded step"
        err = np.max(np.abs(a - b))
        assert err <= 1e-8 * vref, (
            f"sharded {name} deviates from single-device by {err:.3e} "
            f"(allowed {1e-8 * vref:.3e})"
        )
    print(
        f"dryrun_multichip OK: mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
        f"stokes iters {int(diag['stokes_iterations'])}, "
        f"sharded == single-device to 1e-8"
    )
