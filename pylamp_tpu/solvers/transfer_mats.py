"""Separable matrix forms of the staggered-lattice MG transfers.

The fused coarse-V-cycle kernel (ops/pallas/coarse_vcycle_kernel.py) runs
every level below a cutoff in one VMEM residency; inside the kernel the
restriction/prolongation are applied as two small dense matmuls per
lattice (coarse = Ay @ f @ Ax^T), which lower onto the MXU instead of the
interleave/stride slicing the jnp transfers use (lane-dim interleaves are
hostile to Mosaic; 128x257-sized matmuls are free).

The matrices are EXACTLY the linear operators of solvers/mg.py
restrict_vx / prolong_vx / restrict_vy / prolong_vy (full coarsening,
non-periodic): BC ghost weights (free-slip mirror s=+1 / no-slip
anti-mirror s=-1) are folded into the y/x factors and the Dirichlet
zeroing into the input/output sides.  tests/test_transfer_mats.py asserts
element-exact agreement with the jnp transfers on random fields.

Host-side numpy; built once per (shape, BC) and cached.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=64)
def _restrict_vx_mats(ny: int, nx: int, s_top: float, s_bottom: float):
    NY, NX = ny // 2, nx // 2
    Ay = np.zeros((NY, ny))
    for J in range(NY):
        for off, w in ((0, 0.25), (1, 0.75), (2, 0.75), (3, 0.25)):
            k = 2 * J + off  # ghosted row index
            if k == 0:
                Ay[J, 0] += w * s_top / 2.0
            elif k == ny + 1:
                Ay[J, ny - 1] += w * s_bottom / 2.0
            else:
                Ay[J, k - 1] += w / 2.0
    Ax = np.zeros((NX + 1, nx + 1))
    for I in range(NX + 1):
        for off, w in ((-1, 0.5), (0, 1.0), (1, 0.5)):
            i = 2 * I + off
            if 0 <= i <= nx:
                Ax[I, i] += w / 2.0
    Ax[:, 0] = 0.0
    Ax[:, nx] = 0.0  # Dirichlet input columns
    Ax[0, :] = 0.0
    Ax[NX, :] = 0.0  # Dirichlet output columns
    return Ay, Ax


@lru_cache(maxsize=64)
def _prolong_vx_mats(ny: int, nx: int, s_top: float, s_bottom: float):
    NY, NX = ny // 2, nx // 2
    Py = np.zeros((ny, NY))

    def cg(row, k, w):
        if k == 0:
            Py[row, 0] += w * s_top
        elif k == NY + 1:
            Py[row, NY - 1] += w * s_bottom
        else:
            Py[row, k - 1] += w

    for j in range(NY):
        cg(2 * j, j, 0.25)
        cg(2 * j, j + 1, 0.75)       # a0
        cg(2 * j + 1, j + 1, 0.75)
        cg(2 * j + 1, j + 2, 0.25)   # a1
    Px = np.zeros((nx + 1, NX + 1))
    for I in range(NX):
        Px[2 * I, I] += 1.0
        Px[2 * I + 1, I] += 0.5
        Px[2 * I + 1, I + 1] += 0.5
    Px[nx, NX] += 1.0
    Px[:, 0] = 0.0
    Px[:, NX] = 0.0   # Dirichlet input
    Px[0, :] = 0.0
    Px[nx, :] = 0.0   # Dirichlet output
    return Py, Px


@lru_cache(maxsize=64)
def _restrict_vy_mats(ny: int, nx: int, s_left: float, s_right: float):
    NY, NX = ny // 2, nx // 2
    Bx = np.zeros((NX, nx))
    for I in range(NX):
        for off, w in ((0, 0.25), (1, 0.75), (2, 0.75), (3, 0.25)):
            k = 2 * I + off
            if k == 0:
                Bx[I, 0] += w * s_left / 2.0
            elif k == nx + 1:
                Bx[I, nx - 1] += w * s_right / 2.0
            else:
                Bx[I, k - 1] += w / 2.0
    By = np.zeros((NY + 1, ny + 1))
    for J in range(NY + 1):
        for off, w in ((-1, 0.5), (0, 1.0), (1, 0.5)):
            j = 2 * J + off
            if 0 <= j <= ny:
                By[J, j] += w / 2.0
    By[:, 0] = 0.0
    By[:, ny] = 0.0
    By[0, :] = 0.0
    By[NY, :] = 0.0
    return By, Bx


@lru_cache(maxsize=64)
def _prolong_vy_mats(ny: int, nx: int, s_left: float, s_right: float):
    NY, NX = ny // 2, nx // 2
    Qx = np.zeros((nx, NX))

    def cg(col, k, w):
        if k == 0:
            Qx[col, 0] += w * s_left
        elif k == NX + 1:
            Qx[col, NX - 1] += w * s_right
        else:
            Qx[col, k - 1] += w

    for i in range(NX):
        cg(2 * i, i, 0.25)
        cg(2 * i, i + 1, 0.75)
        cg(2 * i + 1, i + 1, 0.75)
        cg(2 * i + 1, i + 2, 0.25)
    Qy = np.zeros((ny + 1, NY + 1))
    for J in range(NY):
        Qy[2 * J, J] += 1.0
        Qy[2 * J + 1, J] += 0.5
        Qy[2 * J + 1, J + 1] += 0.5
    Qy[ny, NY] += 1.0
    Qy[:, 0] = 0.0
    Qy[:, NY] = 0.0
    Qy[0, :] = 0.0
    Qy[ny, :] = 0.0
    return Qy, Qx


def transfer_mats(ny: int, nx: int, bcs, dtype=np.float32):
    """All eight factors for one full-coarsening level step from the fine
    (ny, nx) lattice pair, as numpy arrays:
    restrict_vx: c = Ay f Ax^T;  prolong_vx: f = Py c Px^T
    restrict_vy: c = By f Bx^T;  prolong_vy: f = Qy c Qx^T."""
    st, sb = float(bcs.s_top), float(bcs.s_bottom)
    sl, sr = float(bcs.s_left), float(bcs.s_right)
    Ay, Ax = _restrict_vx_mats(ny, nx, st, sb)
    Py, Px = _prolong_vx_mats(ny, nx, st, sb)
    By, Bx = _restrict_vy_mats(ny, nx, sl, sr)
    Qy, Qx = _prolong_vy_mats(ny, nx, sl, sr)
    return {
        "rvx": (Ay.astype(dtype), Ax.astype(dtype)),
        "pvx": (Py.astype(dtype), Px.astype(dtype)),
        "rvy": (By.astype(dtype), Bx.astype(dtype)),
        "pvy": (Qy.astype(dtype), Qx.astype(dtype)),
    }
