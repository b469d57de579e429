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
            precision="f32",
            stokes_tol=1e-4,
            stokes_restart=20,
            stokes_maxiter=40,
            mg_levels=2,
        ),
    )
    grid, table, state = build(cfg, dtype=jnp.float32)

    mesh = make_mesh(n_devices)
    state = shard_state(state, mesh)
    shardings = state_shardings(mesh, state)

    step = jax.jit(make_step(grid, cfg, table), in_shardings=(shardings,))
    new_state, diag = step(state)
    jax.block_until_ready(new_state.vx)

    for name in ("vx", "vy", "T"):
        arr = np.asarray(getattr(new_state, name))
        assert np.all(np.isfinite(arr)), f"non-finite {name} in sharded step"
    print(
        f"dryrun_multichip OK: mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
        f"stokes iters {int(diag['stokes_iterations'])}"
    )
