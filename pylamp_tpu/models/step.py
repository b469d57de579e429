"""One model timestep: the core loop of the framework (SURVEY.md §3.2).

    marker props -> marker->grid interp -> Stokes solve -> dt (Courant)
    -> implicit energy solve + marker T update (optional subgrid diffusion)
    -> RK4 marker advection

The whole step is a single jittable, scan-able function of ModelState: no
host round-trips, static shapes, adaptive dt as a traced scalar.  Under a
device mesh the same function runs domain-decomposed (parallel/).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.advect import advect_rk4
from pylamp_tpu.markers.bucket import (
    BucketedMarkers,
    bucket_advect_rk4,
    bucket_grid_to_markers,
    bucket_markers_to_grid,
    bucket_reseed,
    rebucket,
)
from pylamp_tpu.markers.interp import grid_to_markers, markers_to_grid
from pylamp_tpu.models.config import ModelConfig
from pylamp_tpu.models.state import ModelState
from pylamp_tpu.physics.materials import MaterialTable
from pylamp_tpu.solvers.energy_solver import solve_energy, solve_energy_mixed
from pylamp_tpu.solvers.stokes_solver import solve_stokes, solve_stokes_mixed


def _m2g(markers, vals, grid, loc, mode):
    """Engine-dispatching marker->grid transfer."""
    if isinstance(markers, BucketedMarkers):
        return bucket_markers_to_grid(markers, vals, grid, loc, mode)
    return markers_to_grid(markers.x, markers.y, vals, grid, loc, mode)


def _g2m(markers, field, grid, loc):
    """Engine-dispatching grid->marker interpolation."""
    if isinstance(markers, BucketedMarkers):
        return bucket_grid_to_markers(field, markers.x, markers.y, markers.valid, grid, loc)
    return grid_to_markers(field, markers.x, markers.y, grid, loc)


def _interp_with_fallback(markers, vals, grid, loc, mode, fallback):
    field, wsum = _m2g(markers, vals, grid, loc, mode)
    return jnp.where(wsum > 0, field, fallback)


def _marker_mean(markers, vals):
    if isinstance(markers, BucketedMarkers):
        w = markers.valid
        return jnp.sum(jnp.where(w, vals, 0.0)) / jnp.maximum(
            jnp.sum(w.astype(vals.dtype)), 1.0
        )
    return jnp.mean(vals)


def make_step(grid: StaggeredGrid, cfg: ModelConfig, table: MaterialTable):
    phys = cfg.physics
    solver = cfg.solver
    tc = cfg.time
    vbc = phys.velocity_bcs
    tbc = phys.thermal_bcs

    if tc.courant > 1.0:
        # the bucket engine's 3x3 rebucketing and the RK4 shift reaches
        # assume markers move at most one cell per step
        raise ValueError("TimeConfig.courant must be <= 1")

    if solver.preconditioner == "mg":
        from pylamp_tpu.solvers.mg import make_mg_preconditioner

        make_precond = partial(
            make_mg_preconditioner,
            levels=solver.mg_levels,
            cycles=solver.mg_cycles,
            pre_smooth=solver.mg_pre_smooth,
            post_smooth=solver.mg_post_smooth,
            use_pallas=solver.use_pallas,
        )
    elif solver.preconditioner == "jacobi":
        make_precond = None
    else:
        raise ValueError(f"unknown preconditioner {solver.preconditioner!r}")

    def step(state: ModelState) -> Tuple[ModelState, Dict[str, Any]]:
        m = state.markers
        dtype = m.x.dtype

        # ---- marker properties (rheology on markers; SURVEY.md §2.1) ----
        rho_m = table.density(m.mat, m.T)
        eta_m = jnp.clip(table.viscosity_of(m.mat, m.T), phys.eta_min, phys.eta_max)
        k_m = table.conductivity(m.mat, dtype)
        rhocp_m = table.rho_cp(m.mat, m.T)
        H_m = table.heating(m.mat, dtype)

        # ---- marker -> grid ------------------------------------------------
        eta_s = _interp_with_fallback(m, eta_m, grid, "corner", phys.eta_avg, state.eta_s)
        eta_n = _interp_with_fallback(m, eta_m, grid, "center", phys.eta_avg, state.eta_n)
        rho_vy = _interp_with_fallback(
            m, rho_m, grid, "vy", "arithmetic", _marker_mean(m, rho_m)
        )
        if phys.gx != 0.0:
            rho_vx = _interp_with_fallback(
                m, rho_m, grid, "vx", "arithmetic", _marker_mean(m, rho_m)
            )
        else:
            rho_vx = jnp.zeros(grid.shape_vx, dtype)

        # ---- Stokes solve (warm-started) ------------------------------------
        mixed = solver.precision == "mixed" or (
            solver.precision == "auto"
            and dtype == jnp.float32
            and jax.config.jax_enable_x64
        )
        if mixed:
            sol = solve_stokes_mixed(
                eta_s,
                eta_n,
                rho_vx,
                rho_vy,
                phys.gx,
                phys.gy,
                grid,
                vbc,
                tol=solver.stokes_tol,
                inner_tol=solver.inner_tol,
                restart=solver.stokes_restart,
                maxiter=solver.stokes_maxiter,
                max_refinements=solver.max_refinements,
                x0=(state.vx, state.vy, state.p),
                make_preconditioner=make_precond,
            )
        else:
            sol = solve_stokes(
                eta_s,
                eta_n,
                rho_vx,
                rho_vy,
                phys.gx,
                phys.gy,
                grid,
                vbc,
                tol=solver.stokes_tol,
                restart=solver.stokes_restart,
                maxiter=solver.stokes_maxiter,
                x0=(state.vx, state.vy, state.p),
                make_preconditioner=make_precond,
            )
        vx = sol.vx.astype(dtype)
        vy = sol.vy.astype(dtype)
        p = sol.p.astype(dtype)

        # ---- dt selection (Courant + optional diffusion cap) ----------------
        vxmax = jnp.max(jnp.abs(vx))
        vymax = jnp.max(jnp.abs(vy))
        big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
        dt_adv = tc.courant * jnp.minimum(
            jnp.where(vxmax > 0, grid.dx / vxmax, big),
            jnp.where(vymax > 0, grid.dy / vymax, big),
        )
        dt = jnp.minimum(dt_adv, tc.dt_max)
        if tc.dt_diff_factor != float("inf") and phys.solve_energy:
            kappa_max = jnp.max(k_m / rhocp_m)
            dt_diff = tc.dt_diff_factor * min(grid.dx, grid.dy) ** 2 / kappa_max
            dt = jnp.minimum(dt, dt_diff)
        dt = jnp.maximum(dt, tc.dt_min)

        diag = {
            "stokes_iterations": sol.info.iterations,
            "stokes_residual": sol.info.residual,
            "stokes_converged": sol.info.converged,
            "dt": dt,
            "vmax": jnp.maximum(vxmax, vymax),
            "vrms": jnp.sqrt(
                jnp.mean(
                    (0.5 * (vx[:, 1:] + vx[:, :-1])) ** 2
                    + (0.5 * (vy[1:, :] + vy[:-1, :])) ** 2
                )
            ),
        }

        # ---- energy solve + marker temperature update -----------------------
        markers = m
        if phys.solve_energy:
            T_old = _interp_with_fallback(
                m, m.T, grid, "corner", "arithmetic", state.T
            )
            k_g = _interp_with_fallback(
                m, k_m, grid, "corner", "arithmetic", _marker_mean(m, k_m)
            )
            rhocp_g = _interp_with_fallback(
                m, rhocp_m, grid, "corner", "arithmetic", _marker_mean(m, rhocp_m)
            )
            H_g = _interp_with_fallback(
                m, H_m, grid, "corner", "arithmetic", jnp.asarray(0.0, dtype)
            )
            if phys.shear_heating:
                from pylamp_tpu.physics.heating import shear_heating

                H_g = H_g + shear_heating(vx, vy, eta_n, grid, vbc)
            if phys.adiabatic_heating:
                from pylamp_tpu.physics.heating import adiabatic_heating

                ra_m = jnp.asarray(table.rho0, dtype)[m.mat] * jnp.asarray(
                    table.alpha, dtype
                )[m.mat]
                ra_g = _interp_with_fallback(
                    m, ra_m, grid, "corner", "arithmetic", _marker_mean(m, ra_m)
                )
                H_g = H_g + adiabatic_heating(T_old, ra_g, vy, phys.gy, grid)
            if mixed:
                esol = solve_energy_mixed(
                    T_old,
                    k_g,
                    rhocp_g / dt,
                    H_g,
                    grid,
                    tbc,
                    tol=solver.energy_tol,
                    maxiter=solver.energy_maxiter,
                    k_avg=phys.k_face_avg,
                )
            else:
                esol = solve_energy(
                    T_old,
                    k_g,
                    rhocp_g / dt,
                    H_g,
                    grid,
                    tbc,
                    tol=solver.energy_tol,
                    maxiter=solver.energy_maxiter,
                    k_avg=phys.k_face_avg,
                )
            T_new = esol.T.astype(dtype)

            if phys.subgrid_diffusion_d > 0.0:
                # Gerya-style subgrid diffusion: relax marker T toward the
                # old grid T on the cell-diffusion timescale, then remap
                # only the remaining part of dT (SURVEY.md §2.1
                # "subgrid-diffusion correction").
                T_node_at_m = _g2m(m, T_old, grid, "corner")
                t_diff = rhocp_m / (
                    k_m * (2.0 / grid.dx**2 + 2.0 / grid.dy**2)
                )
                relax = 1.0 - jnp.exp(-phys.subgrid_diffusion_d * dt / t_diff)
                dT_sub_m = (T_node_at_m - m.T) * relax
                dT_sub_g, wsub = _m2g(m, dT_sub_m, grid, "corner", "arithmetic")
                dT_sub_g = jnp.where(wsub > 0, dT_sub_g, 0.0)
                dT_rem = (T_new - T_old) - dT_sub_g
                T_m = m.T + dT_sub_m + _g2m(m, dT_rem, grid, "corner")
            else:
                dT = T_new - T_old
                T_m = m.T + _g2m(m, dT, grid, "corner")

            markers = markers.replace(T=T_m)
            diag["energy_iterations"] = esol.info.iterations
            diag["T_mean"] = jnp.mean(T_new)
        else:
            T_new = state.T

        # ---- advect markers (+ re-bucket in the dense engine) -----------------
        if isinstance(markers, BucketedMarkers):
            # Courant <= 0.5 (and static walls) bounds every RK stage
            # displacement to half a cell -> the cheaper shift reach applies.
            moving_walls = any(
                getattr(vbc, f) != 0.0
                for f in ("vt_top", "vt_bottom", "vt_left", "vt_right")
            )
            # (dt_min could push dt past the Courant bound -> stay at 2)
            reach = 1 if (tc.courant <= 0.5 and tc.dt_min == 0.0
                          and not moving_walls) else 2
            markers = bucket_advect_rk4(markers, vx, vy, dt, grid, vbc,
                                        stage_reach=reach)
            markers, dropped = rebucket(markers, grid)
            diag["markers_dropped"] = dropped
            diag["marker_count"] = markers.total()
            if phys.reseed_min_per_cell > 0:
                markers = bucket_reseed(
                    markers, T_new, grid, min_per_cell=phys.reseed_min_per_cell
                )
        else:
            px, py = advect_rk4(markers.x, markers.y, vx, vy, dt, grid, vbc)
            markers = markers.replace(x=px, y=py)

            # ---- repopulate starved cells (optional) --------------------------
            if phys.reseed_min_per_cell > 0:
                from pylamp_tpu.markers.reseed import reseed_starved

                markers = reseed_starved(
                    markers,
                    T_new,
                    grid,
                    n_materials=len(table),
                    min_per_cell=phys.reseed_min_per_cell,
                    max_moves=phys.reseed_max_moves,
                )

        new_state = state.replace(
            markers=markers,
            vx=vx,
            vy=vy,
            p=p,
            T=T_new,
            eta_s=eta_s,
            eta_n=eta_n,
            time=state.time + dt,
            step=state.step + 1,
            dt=dt,
        )
        return new_state, diag

    return step
