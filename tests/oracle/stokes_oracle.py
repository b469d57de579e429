"""CPU oracle: explicit scipy sparse assembly of the staggered-grid Stokes
system, written loop-by-loop and independently of the matrix-free JAX
operators.

This reproduces the reference's approach (scipy sparse assembly + direct
spsolve; SURVEY.md §2.1 / §3.4 — the reference mount was empty, so this
oracle IS the executable stand-in that makes "match PyLamp CPU results"
testable, per SURVEY.md §8.3).  It doubles as the measured CPU performance
baseline (BASELINE.md).

DOF ordering: vx (ny x (nx+1)) row-major, then vy ((ny+1) x nx), then
p (ny x nx).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


class StokesOracle:
    def __init__(self, nx, ny, lx, ly, bcs, x_edges=None, y_edges=None):
        self.nx, self.ny, self.lx, self.ly = nx, ny, lx, ly
        self.dx, self.dy = lx / nx, ly / ny
        self.bcs = bcs
        self.periodic = bool(getattr(bcs, "periodic_x", False))
        if self.periodic and (x_edges is not None or y_edges is not None):
            raise ValueError("periodic oracle assumes a uniform grid")
        # per-cell spacings (uniform when no edges given) — the assembly
        # below is written entirely in terms of these, so the stretched
        # (Gerya variable-grid) discretization is the general case and the
        # uniform one its special case
        self.dxc = (np.diff(np.asarray(x_edges, float))
                    if x_edges is not None else np.full(nx, lx / nx))
        self.dyc = (np.diff(np.asarray(y_edges, float))
                    if y_edges is not None else np.full(ny, ly / ny))
        self.dxv = 0.5 * (self.dxc[:-1] + self.dxc[1:])  # center gaps
        self.dyv = 0.5 * (self.dyc[:-1] + self.dyc[1:])
        # corner-lattice gaps (wall entries: mirror ghost at one cell)
        self.dxn = np.concatenate([[self.dxc[0]], self.dxv, [self.dxc[-1]]])
        self.dyn = np.concatenate([[self.dyc[0]], self.dyv, [self.dyc[-1]]])
        self.nvx = ny * (nx + 1)
        self.nvy = (ny + 1) * nx
        self.np_ = ny * nx
        self.n = self.nvx + self.nvy + self.np_

    # -- DOF indexing ------------------------------------------------------
    def ivx(self, j, i):
        return j * (self.nx + 1) + i

    def ivy(self, j, i):
        return self.nvx + j * self.nx + i

    def ip(self, j, i):
        return self.nvx + self.nvy + j * self.nx + i

    # -- ghost substitution: map ghost indices to (real index, sign) --------
    def vx_entries(self, j, i):
        """vx[j,i] where j may be -1 or ny (ghost rows)."""
        if j == -1:
            return [(self.ivx(0, i), self.bcs.s_top)]
        if j == self.ny:
            return [(self.ivx(self.ny - 1, i), self.bcs.s_bottom)]
        return [(self.ivx(j, i), 1.0)]

    def vy_entries(self, j, i):
        """vy[j,i] where i may be -1 or nx (ghost cols; periodic wraps)."""
        if i == -1:
            if self.periodic:
                return [(self.ivy(j, self.nx - 1), 1.0)]
            return [(self.ivy(j, 0), self.bcs.s_left)]
        if i == self.nx:
            if self.periodic:
                return [(self.ivy(j, 0), 1.0)]
            return [(self.ivy(j, self.nx - 1), self.bcs.s_right)]
        return [(self.ivy(j, i), 1.0)]

    # -- assembly ------------------------------------------------------------
    def assemble(self, eta_s, eta_n, kcont=1.0, kbnd=1.0):
        """Assemble A (CSR).  eta_s: (ny+1, nx+1), eta_n: (ny, nx)."""
        nx, ny, dx, dy = self.nx, self.ny, self.dx, self.dy
        A = sp.lil_matrix((self.n, self.n))

        def add_vx(row, j, i, c):
            for idx, s in self.vx_entries(j, i):
                A[row, idx] += s * c

        def add_vy(row, j, i, c):
            for idx, s in self.vy_entries(j, i):
                A[row, idx] += s * c

        def seam_x_row(r, j, f):
            """Wrapped x-momentum equation at the seam node (vx columns 0
            and nx are the same physical node), scaled by ``f``.  Matches
            ops/stokes.py: sxx[j,0] reads vx[:,0..1], sxx[j,nx-1] reads the
            DUPLICATE column vx[:,nx] (and vx[:,nx-1])."""
            add_vx(r, j, 1, -2.0 * eta_n[j, 0] / dx**2 * f)
            add_vx(r, j, 0, 2.0 * eta_n[j, 0] / dx**2 * f)
            A[r, self.ivx(j, nx)] += 2.0 * eta_n[j, nx - 1] / dx**2 * f
            add_vx(r, j, nx - 1, -2.0 * eta_n[j, nx - 1] / dx**2 * f)
            eu, ed = eta_s[j, 0], eta_s[j + 1, 0]
            add_vx(r, j + 1, 0, -ed / dy**2 * f)
            add_vx(r, j, 0, (ed + eu) / dy**2 * f)
            add_vx(r, j - 1, 0, -eu / dy**2 * f)
            add_vy(r, j + 1, 0, -ed / (dx * dy) * f)
            add_vy(r, j + 1, -1, ed / (dx * dy) * f)
            add_vy(r, j, 0, eu / (dx * dy) * f)
            add_vy(r, j, -1, -eu / (dx * dy) * f)
            A[r, self.ip(j, 0)] += f / dx
            A[r, self.ip(j, nx - 1)] += -f / dx

        dxc, dyc = self.dxc, self.dyc
        dxv, dyv = self.dxv, self.dyv
        dxn, dyn = self.dxn, self.dyn

        # x-momentum rows
        for j in range(ny):
            for i in range(nx + 1):
                r = self.ivx(j, i)
                if i == 0 or i == nx:
                    if self.periodic:
                        # half-row convention (ops/stokes.py)
                        seam_x_row(r, j, 0.5)
                    else:
                        A[r, r] = kbnd
                    continue
                # -(sxx[j,i]-sxx[j,i-1])/dxv_i ; sxx[j,c] = 2 en (dvx/dxc_c)
                dv = dxv[i - 1]
                add_vx(r, j, i + 1, -2.0 * eta_n[j, i] / (dxc[i] * dv))
                add_vx(r, j, i,
                       2.0 * (eta_n[j, i] / dxc[i] + eta_n[j, i - 1] / dxc[i - 1]) / dv)
                add_vx(r, j, i - 1, -2.0 * eta_n[j, i - 1] / (dxc[i - 1] * dv))
                # -(sxy[j+1,i]-sxy[j,i])/dyc_j ; sxy[J,i] has dvx/dyn_J and
                # dvy/dxn_i
                eu, ed = eta_s[j, i], eta_s[j + 1, i]
                add_vx(r, j + 1, i, -ed / (dyn[j + 1] * dyc[j]))
                add_vx(r, j, i, (ed / dyn[j + 1] + eu / dyn[j]) / dyc[j])
                add_vx(r, j - 1, i, -eu / (dyn[j] * dyc[j]))
                add_vy(r, j + 1, i, -ed / (dxn[i] * dyc[j]))
                add_vy(r, j + 1, i - 1, ed / (dxn[i] * dyc[j]))
                add_vy(r, j, i, eu / (dxn[i] * dyc[j]))
                add_vy(r, j, i - 1, -eu / (dxn[i] * dyc[j]))
                # +(p[j,i]-p[j,i-1])/dxv_i
                A[r, self.ip(j, i)] += 1.0 / dv
                A[r, self.ip(j, i - 1)] += -1.0 / dv

        # y-momentum rows
        for j in range(ny + 1):
            for i in range(nx):
                r = self.ivy(j, i)
                if j == 0 or j == ny:
                    A[r, r] = kbnd
                    continue
                # -(syy[j,i]-syy[j-1,i])/dyv_j
                dv = dyv[j - 1]
                add_vy(r, j + 1, i, -2.0 * eta_n[j, i] / (dyc[j] * dv))
                add_vy(r, j, i,
                       2.0 * (eta_n[j, i] / dyc[j] + eta_n[j - 1, i] / dyc[j - 1]) / dv)
                add_vy(r, j - 1, i, -2.0 * eta_n[j - 1, i] / (dyc[j - 1] * dv))
                # -(sxy[j,i+1]-sxy[j,i])/dxc_i
                el, er = eta_s[j, i], eta_s[j, i + 1]
                add_vy(r, j, i + 1, -er / (dxn[i + 1] * dxc[i]))
                add_vy(r, j, i, (er / dxn[i + 1] + el / dxn[i]) / dxc[i])
                add_vy(r, j, i - 1, -el / (dxn[i] * dxc[i]))
                add_vx(r, j, i + 1, -er / (dyn[j] * dxc[i]))
                add_vx(r, j - 1, i + 1, er / (dyn[j] * dxc[i]))
                add_vx(r, j, i, el / (dyn[j] * dxc[i]))
                add_vx(r, j - 1, i, -el / (dyn[j] * dxc[i]))
                # +(p[j,i]-p[j-1,i])/dyv_j
                A[r, self.ip(j, i)] += 1.0 / dv
                A[r, self.ip(j - 1, i)] += -1.0 / dv

        # continuity rows
        for j in range(ny):
            for i in range(nx):
                r = self.ip(j, i)
                add_vx(r, j, i + 1, kcont / dxc[i])
                add_vx(r, j, i, -kcont / dxc[i])
                add_vy(r, j + 1, i, kcont / dyc[j])
                add_vy(r, j, i, -kcont / dyc[j])

        return A.tocsr()

    def rhs(self, rho_vx, rho_vy, gx, gy, kbnd=1.0):
        b = np.zeros(self.n)
        bx = np.asarray(rho_vx * gx, dtype=float).copy()
        by = np.asarray(rho_vy * gy, dtype=float).copy()
        if self.periodic:
            bx[:, 0] *= 0.5
            bx[:, -1] *= 0.5
        else:
            bx[:, 0] = kbnd * self.bcs.vn_left
            bx[:, -1] = kbnd * self.bcs.vn_right
        by[0, :] = kbnd * self.bcs.vn_top
        by[-1, :] = kbnd * self.bcs.vn_bottom
        b[: self.nvx] = bx.ravel()
        b[self.nvx : self.nvx + self.nvy] = by.ravel()
        return b

    def split(self, u):
        """Flat solution vector -> (vx, vy, p) arrays."""
        nx, ny = self.nx, self.ny
        vx = u[: self.nvx].reshape(ny, nx + 1)
        vy = u[self.nvx : self.nvx + self.nvy].reshape(ny + 1, nx)
        p = u[self.nvx + self.nvy :].reshape(ny, nx)
        return vx, vy, p

    def pack(self, vx, vy, p):
        return np.concatenate([vx.ravel(), vy.ravel(), p.ravel()])

    def solve(self, eta_s, eta_n, rho_vx, rho_vy, gx, gy, kcont=None, kbnd=None):
        """Direct spsolve with the pressure nullspace pinned (reference
        style: fix one pressure DOF; SURVEY.md §3.2), then shift p so that
        mean(p) = 0."""
        eta_char = float(np.exp(np.mean(np.log(eta_n))))
        dxm, dym = float(self.dxc.min()), float(self.dyc.min())
        if kcont is None:
            kcont = 2.0 * eta_char / (dxm + dym)
        if kbnd is None:
            kbnd = 4.0 * eta_char / min(dxm, dym) ** 2
        A = self.assemble(eta_s, eta_n, kcont=kcont, kbnd=kbnd).tolil()
        b = self.rhs(rho_vx, rho_vy, gx, gy, kbnd=kbnd)
        if self.periodic:
            # The half-row assembly is singular (duplicate seam rows are
            # identical).  For the direct solve: promote the i=0 seam rows
            # to the FULL physical equation and replace the duplicate i=nx
            # rows with tie rows  kbnd*(vx[:,nx] - vx[:,0]) = 0.
            for j in range(self.ny):
                r0, rn = self.ivx(j, 0), self.ivx(j, self.nx)
                A.rows[r0] = list(A.rows[r0])
                A.data[r0] = [2.0 * v for v in A.data[r0]]
                b[r0] *= 2.0
                A.rows[rn] = [self.ivx(j, 0), rn]
                A.data[rn] = [-kbnd, kbnd]
                b[rn] = 0.0
            if self.bcs.top == "free_slip" and self.bcs.bottom == "free_slip":
                # constant-vx nullspace: pin one vx DOF (the dropped row is
                # in the span of the rest for a compatible RHS), then shift
                # to the zero-mean gauge below
                r = self.ivx(0, 1)
                A.rows[r] = [r]
                A.data[r] = [kbnd]
                b[r] = 0.0
        # pin p[0,0]: replace its continuity row with kbnd * p = 0
        r = self.ip(0, 0)
        A.rows[r] = [r]
        A.data[r] = [kbnd]
        b[r] = 0.0
        u = spla.spsolve(A.tocsr(), b)
        vx, vy, p = self.split(u)
        p = p - p.mean()
        if self.periodic and self.bcs.top == "free_slip" and self.bcs.bottom == "free_slip":
            vx = vx - vx[:, :-1].mean()
        return vx, vy, p
