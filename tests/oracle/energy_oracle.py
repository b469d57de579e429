"""CPU oracle: explicit scipy assembly of the implicit heat-diffusion system
on the corner-node grid, independent of the matrix-free JAX operator.

Matches the discretization in pylamp_tpu/ops/energy.py (derived separately):
interior 5-point variable-k stencil; Dirichlet walls as identity rows;
Neumann walls via ghost elimination (ghost T = mirror + 2h*g with g the
outward-normal gradient -> doubled inner coefficient + RHS constant
+2*k_face*g/h).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def _face(a, b, mode):
    if mode == "arithmetic":
        return 0.5 * (a + b)
    if mode == "harmonic":
        return 2.0 * a * b / (a + b)
    raise ValueError(mode)


class EnergyOracle:
    def __init__(self, nx, ny, lx, ly, bcs, k_avg="arithmetic",
                 x_edges=None, y_edges=None):
        self.nx, self.ny = nx, ny
        self.dx, self.dy = lx / nx, ly / ny
        self.bcs = bcs
        self.periodic = bool(getattr(bcs, "periodic_x", False))
        if self.periodic and (x_edges is not None or y_edges is not None):
            raise ValueError("periodic oracle assumes a uniform grid")
        self.k_avg = k_avg
        self.nyn, self.nxn = ny + 1, nx + 1  # node counts
        self.n = self.nyn * self.nxn
        # variable spacing (Gerya-style): hx[i] = gap east of node i (ghost
        # mirrors at one cell width); wx[i] = node control width
        dxc = (np.diff(np.asarray(x_edges, float))
               if x_edges is not None else np.full(nx, lx / nx))
        dyc = (np.diff(np.asarray(y_edges, float))
               if y_edges is not None else np.full(ny, ly / ny))
        self.hx = np.concatenate([dxc, [dxc[-1]]])  # east gap of node i
        self.hy = np.concatenate([dyc, [dyc[-1]]])
        self.gwx = np.concatenate([[dxc[0]], dxc])  # west gap of node i
        self.gwy = np.concatenate([[dyc[0]], dyc])
        self.wx = np.concatenate([[dxc[0]], 0.5 * (dxc[:-1] + dxc[1:]), [dxc[-1]]])
        self.wy = np.concatenate([[dyc[0]], 0.5 * (dyc[:-1] + dyc[1:]), [dyc[-1]]])

    def idx(self, j, i):
        return j * self.nxn + i

    def _dirichlet_mask(self):
        m = np.zeros((self.nyn, self.nxn), dtype=bool)
        v = np.zeros((self.nyn, self.nxn))
        if self.bcs.left.kind == "dirichlet":
            m[:, 0] = True
            v[:, 0] = self.bcs.left.value
        if self.bcs.right.kind == "dirichlet":
            m[:, -1] = True
            v[:, -1] = self.bcs.right.value
        if self.bcs.top.kind == "dirichlet":
            m[0, :] = True
            v[0, :] = self.bcs.top.value
        if self.bcs.bottom.kind == "dirichlet":
            m[-1, :] = True
            v[-1, :] = self.bcs.bottom.value
        return m, v

    def _T_entries(self, j, i):
        """Ghost substitution: mirror about the wall node's neighbour, or
        wrap with period nx on periodic side walls (the node west of col 0
        is col nx-1; east of col nx is col 1 — col nx duplicates col 0)."""
        jj, ii = j, i
        if ii == -1:
            ii = self.nxn - 2 if self.periodic else 1
        if ii == self.nxn:
            ii = 1 if self.periodic else self.nxn - 2
        if jj == -1:
            jj = 1
        if jj == self.nyn:
            jj = self.nyn - 2
        return self.idx(jj, ii)

    def _k_at(self, k, j, i):
        if j == -1:
            jj = 1
        elif j == self.nyn:
            jj = self.nyn - 2
        else:
            jj = min(max(j, 0), self.nyn - 1)
        if i == -1:
            ii = self.nxn - 2 if self.periodic else 1
        elif i == self.nxn:
            ii = 1 if self.periodic else self.nxn - 2
        else:
            ii = min(max(i, 0), self.nxn - 1)
        return k[jj, ii]

    def assemble(self, k, rhocp_over_dt, kbnd=1.0):
        dx, dy = self.dx, self.dy
        A = sp.lil_matrix((self.n, self.n))
        dir_mask, _ = self._dirichlet_mask()
        rc = np.broadcast_to(rhocp_over_dt, (self.nyn, self.nxn))

        for j in range(self.nyn):
            for i in range(self.nxn):
                r = self.idx(j, i)
                if dir_mask[j, i]:
                    A[r, r] = kbnd
                    continue
                # periodic seam columns: each duplicate row carries HALF the
                # physical equation (ops/energy.py half-row convention); the
                # diagonal/adjacent-row entries stay on the row's own
                # duplicate column
                f = 0.5 if self.periodic and i in (0, self.nxn - 1) else 1.0
                A[r, r] += f * rc[j, i]
                # x fluxes: faces east (gap hx[i]) and west (gap gwx[i]),
                # divergence over the node control width wx[i]
                k_r = _face(self._k_at(k, j, i), self._k_at(k, j, i + 1), self.k_avg)
                k_l = _face(self._k_at(k, j, i - 1), self._k_at(k, j, i), self.k_avg)
                he, hw, w = self.hx[i], self.gwx[i], self.wx[i]
                A[r, self._T_entries(j, i + 1)] += -f * k_r / (he * w)
                A[r, r] += f * (k_r / he + k_l / hw) / w
                A[r, self._T_entries(j, i - 1)] += -f * k_l / (hw * w)
                # y fluxes
                k_d = _face(self._k_at(k, j, i), self._k_at(k, j + 1, i), self.k_avg)
                k_u = _face(self._k_at(k, j - 1, i), self._k_at(k, j, i), self.k_avg)
                he, hw, w = self.hy[j], self.gwy[j], self.wy[j]
                A[r, self._T_entries(j + 1, i)] += -f * k_d / (he * w)
                A[r, r] += f * (k_d / he + k_u / hw) / w
                A[r, self._T_entries(j - 1, i)] += -f * k_u / (hw * w)
        return A.tocsr()

    def rhs(self, T_old, k, rhocp_over_dt, H, kbnd=1.0):
        dx, dy = self.dx, self.dy
        b = np.asarray(rhocp_over_dt * T_old + H, dtype=float).copy()
        if self.periodic:
            b[:, 0] *= 0.5
            b[:, -1] *= 0.5
        bcs = self.bcs
        if bcs.left.kind == "neumann" and bcs.left.value != 0.0:
            kf = _face(k[:, 0], k[:, 1], self.k_avg)
            b[:, 0] += 2.0 * kf * bcs.left.value / self.wx[0]
        if bcs.right.kind == "neumann" and bcs.right.value != 0.0:
            kf = _face(k[:, -2], k[:, -1], self.k_avg)
            b[:, -1] += 2.0 * kf * bcs.right.value / self.wx[-1]
        if bcs.top.kind == "neumann" and bcs.top.value != 0.0:
            kf = _face(k[0, :], k[1, :], self.k_avg)
            b[0, :] += 2.0 * kf * bcs.top.value / self.wy[0]
        if bcs.bottom.kind == "neumann" and bcs.bottom.value != 0.0:
            kf = _face(k[-2, :], k[-1, :], self.k_avg)
            b[-1, :] += 2.0 * kf * bcs.bottom.value / self.wy[-1]
        mask, vals = self._dirichlet_mask()
        b = np.where(mask, kbnd * vals, b)
        return b.ravel()

    def solve(self, T_old, k, rhocp_over_dt, H, kbnd=None):
        if kbnd is None:
            kbnd = float(np.mean(rhocp_over_dt)) + float(np.mean(k)) / self.dx**2
        A = self.assemble(k, rhocp_over_dt, kbnd=kbnd)
        b = self.rhs(T_old, k, rhocp_over_dt, H, kbnd=kbnd)
        return spla.spsolve(A, b).reshape(self.nyn, self.nxn)
