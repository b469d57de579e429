"""Time-loop driver: jitted step + checkpoint/output/metrics around it
(SURVEY.md §3.2's outer loop, plus the aux subsystems of §5: structured
metrics, checkpoint/resume, divergence detection with dt-backoff retry)."""
from __future__ import annotations

import os
import time
from typing import Callable

import jax

from pylamp_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from pylamp_tpu.io.logging import MetricsLogger
from pylamp_tpu.io.output import save_fields
from pylamp_tpu.models.config import ModelConfig
from pylamp_tpu.models.setup import build
from pylamp_tpu.models.step import make_step


def run_model(
    cfg: ModelConfig,
    out_dir: str | None = None,
    checkpoint_every: int = 0,
    output_every: int = 0,
    plot_every: int = 0,
    resume_from: str | None = None,
    echo: bool = False,
    callback: Callable | None = None,
    on_divergence: str = "retry",
    profile_phases: bool = False,
    scan_chunk: int = 0,
    dtype=None,
    step_delay: float = 0.0,
    mesh=None,
):
    """Run the model for cfg.time.max_steps (or until max_time).

    ``mesh``: a ``jax.sharding.Mesh`` for a domain-decomposed multi-chip
    run — the state is sharded over it (parallel/mesh.py) and the step is
    compiled mesh-aware (explicit-halo operators / coarse-level
    replication per SolverConfig).  The CLI builds one from ``--mesh``.

    ``on_divergence``: "retry" re-runs a non-converged step once with a
    stronger solver (4x maxiter, 2x restart — SURVEY.md §5 'Failure
    detection / divergence fallback'); "warn" just records it.

    ``profile_phases``: run the per-phase-instrumented step (interp / stokes
    / energy / advect each jitted separately and synced) and emit
    ``phase_seconds`` into the metrics JSONL (SURVEY.md §5 tracing row).

    ``plot_every``: write a quick-look figure (T, |v|, log eta) every N
    steps into ``out_dir``.

    ``step_delay``: > 0 sleeps that many seconds after each step (per-step
    loop only) — a fault-injection test hook that makes the between-steps
    kill window wide regardless of compile/step speed.

    ``scan_chunk``: > 0 fuses that many steps into one ``lax.scan`` and
    synchronizes with the host only at chunk boundaries (models/step.py
    ``make_multi_step``).  Metrics stay per-step (scan stacks the
    diagnostics); checkpoint/output/plot cadences are rounded to chunk
    boundaries, and the divergence retry re-runs a whole chunk with the
    stronger solver.  Mutually exclusive with ``profile_phases``.

    Returns (final_state, diagnostics list, grid)."""
    import dataclasses

    if scan_chunk > 0 and profile_phases:
        raise ValueError("scan_chunk and profile_phases are mutually exclusive")

    if dtype is None:
        # f64 where available (CPU / x64 sessions); otherwise f32 state —
        # build(dtype=f64) without x64 would silently truncate to f32 AND
        # leave precision="auto" resolving to a plain f32 solve that can
        # never reach the 1e-8 default tolerance.
        import jax.numpy as jnp

        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    grid, table, state = build(cfg, dtype=dtype)
    if resume_from:
        state, _ = load_checkpoint(resume_from, template=state)

    shardings = None
    mesh_tag = None
    if mesh is not None:
        from pylamp_tpu.parallel.mesh import shard_state, state_shardings

        if profile_phases:
            raise ValueError("profile_phases is single-device only "
                             "(per-phase host syncs would serialize the mesh)")
        mesh_tag = f"{mesh.shape['y']}x{mesh.shape['x']}"
        shardings = state_shardings(mesh, state)
        state = shard_state(state, mesh)

    if scan_chunk > 0:
        return _run_scanned(
            cfg, grid, table, state, out_dir, checkpoint_every, output_every,
            plot_every, echo, callback, on_divergence, scan_chunk,
            mesh=mesh, shardings=shardings, mesh_tag=mesh_tag,
        )

    if profile_phases:
        from pylamp_tpu.models.step import make_phased_runner

        step = make_phased_runner(grid, cfg, table)
    elif mesh is not None:
        step = jax.jit(make_step(grid, cfg, table, mesh=mesh),
                       in_shardings=(shardings,))
    else:
        step = jax.jit(make_step(grid, cfg, table))
    strong_step = None  # compiled lazily on first divergence

    logger = MetricsLogger(
        os.path.join(out_dir, "metrics.jsonl") if out_dir else None, echo=echo
    )

    diags = []
    tc = cfg.time
    while int(state.step) < tc.max_steps and float(state.time) < tc.max_time:
        t0 = time.perf_counter()
        new_state, diag = step(state)
        jax.block_until_ready(new_state.vx)
        step_wall = time.perf_counter() - t0

        if not bool(diag["stokes_converged"]):
            if on_divergence == "retry":
                if strong_step is None:
                    strong_cfg = dataclasses.replace(
                        cfg,
                        solver=dataclasses.replace(
                            cfg.solver,
                            stokes_maxiter=4 * cfg.solver.stokes_maxiter,
                            stokes_restart=2 * cfg.solver.stokes_restart,
                        ),
                    )
                    if mesh is not None:
                        strong_step = jax.jit(
                            make_step(grid, strong_cfg, table, mesh=mesh),
                            in_shardings=(shardings,),
                        )
                    else:
                        strong_step = jax.jit(
                            make_step(grid, strong_cfg, table)
                        )
                new_state, diag = strong_step(state)
                jax.block_until_ready(new_state.vx)
                diag["retried"] = True
            if not bool(diag["stokes_converged"]):
                diag["warning"] = "stokes solver did not reach tolerance"
        if int(diag.get("markers_dropped", 0)) > 0:
            # capacity overflow bleeds compositional markers at convergent
            # interfaces — surface it instead of silently degrading
            diag["warning"] = (
                f"{int(diag['markers_dropped'])} markers dropped (bucket "
                f"capacity overflow) — raise ModelConfig.marker_capacity "
                f"(currently auto 2*markers_per_cell_dim^2) or enable reseeding"
            )
        state = new_state

        rec = {"step": int(state.step), "time": float(state.time), "step_wall_s": step_wall}
        if mesh_tag is not None:
            rec["mesh"] = mesh_tag
        rec.update({k: v for k, v in diag.items()})
        logger.log(rec)
        diags.append(diag)

        if callback is not None:
            callback(state, diag)
        if out_dir and output_every and int(state.step) % output_every == 0:
            save_fields(
                os.path.join(out_dir, f"fields_{int(state.step):06d}.npz"), state, grid
            )
        if out_dir and plot_every and int(state.step) % plot_every == 0:
            from pylamp_tpu.io.output import plot_fields

            plot_fields(
                os.path.join(out_dir, f"fields_{int(state.step):06d}.png"), state, grid
            )
        if out_dir and checkpoint_every and int(state.step) % checkpoint_every == 0:
            save_checkpoint(os.path.join(out_dir, "checkpoint.npz"), state)
        if step_delay > 0:
            # test hook (fault injection): a deterministic-width window in
            # which a kill signal can land between steps, independent of how
            # fast the compiled step itself runs
            time.sleep(step_delay)

    logger.close()
    return state, diags, grid


def _run_scanned(cfg, grid, table, state, out_dir, checkpoint_every,
                 output_every, plot_every, echo, callback, on_divergence,
                 scan_chunk, mesh=None, shardings=None, mesh_tag=None):
    """Chunked lax.scan time loop: one host sync per ``scan_chunk`` steps."""
    import dataclasses

    from pylamp_tpu.models.step import make_multi_step

    def _jit_multi(c):
        fn = make_multi_step(grid, c, table, scan_chunk, mesh=mesh)
        if mesh is not None:
            return jax.jit(fn, in_shardings=(shardings,))
        return jax.jit(fn)

    multi = _jit_multi(cfg)
    strong_multi = None

    logger = MetricsLogger(
        os.path.join(out_dir, "metrics.jsonl") if out_dir else None, echo=echo
    )
    diags = []
    tc = cfg.time
    while int(state.step) < tc.max_steps and float(state.time) < tc.max_time:
        t0 = time.perf_counter()
        new_state, chunk_diag = multi(state)
        jax.block_until_ready(new_state.vx)
        chunk_wall = time.perf_counter() - t0

        import numpy as np

        converged = np.asarray(chunk_diag["stokes_converged"])
        if not converged.all() and on_divergence == "retry":
            if strong_multi is None:
                strong_cfg = dataclasses.replace(
                    cfg,
                    solver=dataclasses.replace(
                        cfg.solver,
                        stokes_maxiter=4 * cfg.solver.stokes_maxiter,
                        stokes_restart=2 * cfg.solver.stokes_restart,
                    ),
                )
                strong_multi = _jit_multi(strong_cfg)
            t0 = time.perf_counter()
            new_state, chunk_diag = strong_multi(state)
            jax.block_until_ready(new_state.vx)
            chunk_wall = time.perf_counter() - t0
            converged = np.asarray(chunk_diag["stokes_converged"])

        chunk_host = {k: np.asarray(v) for k, v in chunk_diag.items()}
        base_step = int(state.step)
        base_time = float(state.time)
        times = base_time + np.cumsum(chunk_host["dt"])
        state = new_state
        for i in range(scan_chunk):
            diag = {k: v[i] for k, v in chunk_host.items()}
            if not bool(diag["stokes_converged"]):
                diag["warning"] = "stokes solver did not reach tolerance"
            if int(diag.get("markers_dropped", 0)) > 0:
                diag["warning"] = (
                    f"{int(diag['markers_dropped'])} markers dropped (bucket "
                    f"capacity overflow) — raise ModelConfig.marker_capacity"
                )
            rec = {
                "step": base_step + i + 1,
                "time": float(times[i]),
                "step_wall_s": chunk_wall / scan_chunk,
            }
            if mesh_tag is not None:
                rec["mesh"] = mesh_tag
            rec.update(diag)
            logger.log(rec)
            diags.append(diag)

        if callback is not None:
            callback(state, diags[-1])
        s = int(state.step)
        if out_dir and output_every and s % max(output_every, 1) < scan_chunk:
            save_fields(os.path.join(out_dir, f"fields_{s:06d}.npz"), state, grid)
        if out_dir and plot_every and s % max(plot_every, 1) < scan_chunk:
            from pylamp_tpu.io.output import plot_fields

            plot_fields(os.path.join(out_dir, f"fields_{s:06d}.png"), state, grid)
        if out_dir and checkpoint_every and s % max(checkpoint_every, 1) < scan_chunk:
            save_checkpoint(os.path.join(out_dir, "checkpoint.npz"), state)

    logger.close()
    return state, diags, grid
