"""Method of manufactured solutions for the variable-viscosity Stokes solve
(SURVEY.md §4 'unit' tier): an analytic divergence-free velocity field with
smoothly varying viscosity; the discrete solve must converge to it at 2nd
order as the grid is refined."""
import numpy as np
import jax.numpy as jnp
import sympy as sp

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.ops.stokes import stokes_operator
from pylamp_tpu.solvers.krylov import fgmres
from pylamp_tpu.solvers.mg import make_mg_preconditioner
from pylamp_tpu.solvers.scaling import characteristic_viscosity, stokes_scales


def _manufactured():
    """v from a stream function vanishing (with gradient) on the unit-box
    boundary -> exact no-slip; smooth viscosity; returns lambdified fields
    and momentum right-hand sides  f = -div(2 eta e(v)) + grad p."""
    x, y = sp.symbols("x y")
    psi = (x * (1 - x) * y * (1 - y)) ** 2
    # y points down in the code, but the PDE is orientation-agnostic: we
    # just evaluate fields at (x, y) with y = depth.
    vx = sp.diff(psi, y)
    vy = -sp.diff(psi, x)
    p = sp.cos(sp.pi * x) * sp.cos(sp.pi * y)
    eta = 1 + 10 * x + 20 * y * y

    exx = sp.diff(vx, x)
    eyy = sp.diff(vy, y)
    exy = (sp.diff(vx, y) + sp.diff(vy, x)) / 2
    sxx = 2 * eta * exx
    syy = 2 * eta * eyy
    sxy = 2 * eta * exy
    fx = -(sp.diff(sxx, x) + sp.diff(sxy, y)) + sp.diff(p, x)
    fy = -(sp.diff(sxy, x) + sp.diff(syy, y)) + sp.diff(p, y)

    lam = lambda e: sp.lambdify((x, y), e, "numpy")
    return lam(vx), lam(vy), lam(p), lam(eta), lam(fx), lam(fy)


def _solve_mms(n):
    vx_f, vy_f, p_f, eta_f, fx_f, fy_f = _manufactured()
    grid = StaggeredGrid(nx=n, ny=n, lx=1.0, ly=1.0)
    bcs = VelocityBCs(top="no_slip", bottom="no_slip", left="no_slip", right="no_slip")

    Yc, Xc = np.meshgrid(grid.y_corner, grid.x_corner, indexing="ij")
    Ycc, Xcc = np.meshgrid(grid.y_center, grid.x_center, indexing="ij")
    Yvx, Xvx = np.meshgrid(grid.y_center, grid.x_corner, indexing="ij")
    Yvy, Xvy = np.meshgrid(grid.y_corner, grid.x_center, indexing="ij")

    eta_s = jnp.asarray(eta_f(Xc, Yc))
    eta_n = jnp.asarray(eta_f(Xcc, Ycc))

    eta_char = characteristic_viscosity(eta_n)
    kcont, kbnd = stokes_scales(eta_char, grid)

    def op(u):
        return stokes_operator(u[0], u[1], u[2], eta_s, eta_n, grid, bcs,
                               kcont=kcont, kbnd=kbnd)

    bx = jnp.asarray(fx_f(Xvx, Yvx))
    bx = bx.at[:, 0].set(0.0).at[:, -1].set(0.0)  # exact v is 0 on walls
    by = jnp.asarray(fy_f(Xvy, Yvy))
    by = by.at[0, :].set(0.0).at[-1, :].set(0.0)
    b = (bx, by, jnp.zeros(grid.shape_center))

    M = make_mg_preconditioner(eta_s, eta_n, grid, kcont, kbnd, bcs=bcs)
    x0 = tuple(jnp.zeros(s) for s in (grid.shape_vx, grid.shape_vy, grid.shape_center))
    (vx, vy, p), info = fgmres(op, b, x0, M=M, tol=1e-11, restart=60, maxiter=600)
    assert bool(info.converged), (n, info)

    err_vx = np.abs(np.asarray(vx) - vx_f(Xvx, Yvx)).max()
    err_vy = np.abs(np.asarray(vy) - vy_f(Xvy, Yvy)).max()
    p_num = np.asarray(p)
    p_ex = p_f(Xcc, Ycc)
    p_ex = p_ex - p_ex.mean()
    err_p = np.abs(p_num - p_ex).max()
    vscale = max(np.abs(vx_f(Xvx, Yvx)).max(), 1e-30)
    return err_vx / vscale, err_vy / vscale, err_p


def test_mms_stokes_second_order():
    errs = [max(_solve_mms(n)[:2]) for n in (8, 16, 32)]
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(orders) > 1.7, (errs, orders)
