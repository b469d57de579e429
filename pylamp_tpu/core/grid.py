"""Fully staggered (Gerya-style) 2-D finite-difference grid.

Rebuilds the reference's staggered grid + DOF layout (SURVEY.md §2.1
"Staggered grid & DOF numbering"; reference mount empty this round, so the
layout follows the standard marker-in-cell discretization the reference
implements: pressure at cell centers, velocities at face midpoints, shear
viscosity / temperature at basic (corner) nodes).

Axis convention: index ``[j, i]`` = (row, col) = (y, x); y points *down*
(depth), gravity is ``+y``.  x is the contiguous (last) axis so it maps onto
TPU vector lanes.

Sub-grid layouts for an ``ny x nx``-cell domain of size ``ly x lx``:

- corner / basic nodes ``(ny+1, nx+1)`` at ``(j*dy, i*dx)``:
  shear viscosity ``eta_s``, temperature ``T``, conductivity ``k``, ``rho*Cp``
- cell centers ``(ny, nx)`` at ``((j+1/2)dy, (i+1/2)dx)``:
  pressure ``p``, normal viscosity ``eta_n``
- vx nodes ``(ny, nx+1)`` at ``((j+1/2)dy, i*dx)`` (vertical-face midpoints);
  columns ``i=0`` and ``i=nx`` lie ON the left/right walls
- vy nodes ``(ny+1, nx)`` at ``(j*dy, (i+1/2)dx)`` (horizontal-face
  midpoints); rows ``j=0`` and ``j=ny`` lie ON the top/bottom walls

The grid is *static* configuration (shapes derive from it), not a traced
pytree: pass it to jitted functions as a closure / static argument.
"""
from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np


@dataclasses.dataclass(frozen=True)
class StaggeredGrid:
    """Uniform fully staggered grid. ``nx, ny`` = number of CELLS."""

    nx: int
    ny: int
    lx: float
    ly: float

    def __post_init__(self):
        if self.nx < 2 or self.ny < 2:
            raise ValueError("grid needs at least 2x2 cells")

    # -- spacing ---------------------------------------------------------
    @property
    def dx(self) -> float:
        return self.lx / self.nx

    @property
    def dy(self) -> float:
        return self.ly / self.ny

    # -- sub-grid shapes -------------------------------------------------
    @property
    def shape_corner(self):  # eta_s, T, k, rhocp
        return (self.ny + 1, self.nx + 1)

    @property
    def shape_center(self):  # p, eta_n
        return (self.ny, self.nx)

    @property
    def shape_vx(self):
        return (self.ny, self.nx + 1)

    @property
    def shape_vy(self):
        return (self.ny + 1, self.nx)

    # -- coordinates (host-side numpy; used for setup / oracle / output) --
    @cached_property
    def x_corner(self) -> np.ndarray:
        return np.linspace(0.0, self.lx, self.nx + 1)

    @cached_property
    def y_corner(self) -> np.ndarray:
        return np.linspace(0.0, self.ly, self.ny + 1)

    @cached_property
    def x_center(self) -> np.ndarray:
        return (np.arange(self.nx) + 0.5) * self.dx

    @cached_property
    def y_center(self) -> np.ndarray:
        return (np.arange(self.ny) + 0.5) * self.dy

    def coords(self, loc: str):
        """(y, x) 1-D coordinate arrays of a sub-grid.

        ``loc`` in {"corner", "center", "vx", "vy"}.
        """
        if loc == "corner":
            return self.y_corner, self.x_corner
        if loc == "center":
            return self.y_center, self.x_center
        if loc == "vx":
            return self.y_center, self.x_corner
        if loc == "vy":
            return self.y_corner, self.x_center
        raise ValueError(f"unknown sub-grid location {loc!r}")

    def shape(self, loc: str):
        return {
            "corner": self.shape_corner,
            "center": self.shape_center,
            "vx": self.shape_vx,
            "vy": self.shape_vy,
        }[loc]

    # Origin (position of node [0,0]) of each sub-grid, used by marker
    # interpolation to map positions -> (cell, local coord) per sub-grid.
    def origin(self, loc: str):
        if loc == "corner":
            return (0.0, 0.0)
        if loc == "center":
            return (0.5 * self.dy, 0.5 * self.dx)
        if loc == "vx":
            return (0.5 * self.dy, 0.0)
        if loc == "vy":
            return (0.0, 0.5 * self.dx)
        raise ValueError(f"unknown sub-grid location {loc!r}")

    @property
    def n_stokes_dof(self) -> int:
        ny, nx = self.ny, self.nx
        return ny * (nx + 1) + (ny + 1) * nx + ny * nx
