"""Boundary-condition descriptors (static configuration).

The reference supports free-slip / no-slip velocity walls and fixed-value /
zero-flux temperature boundaries (SURVEY.md §2.1 "Stokes + continuity
assembly" and "Energy equation assembly").  Here they are small frozen
dataclasses usable as static args to jitted functions.
"""
from __future__ import annotations

import dataclasses

FREE_SLIP = "free_slip"
NO_SLIP = "no_slip"
PERIODIC = "periodic"

DIRICHLET = "dirichlet"
NEUMANN = "neumann"


@dataclasses.dataclass(frozen=True)
class VelocityBCs:
    """Per-wall velocity BC.

    Each wall is "free_slip" or "no_slip".  Normal velocity on every wall is
    Dirichlet; its value defaults to 0 (closed box) and can be prescribed per
    wall (``vn_top`` etc., a scalar) for inflow/outflow experiments.

    Tangential handling is via ghost nodes: ghost = s * first_interior with
    s = +1 (free slip, zero shear) or -1 (no slip, zero wall velocity).

    Side walls may instead BOTH be "periodic" (lateral wrap-around): the
    domain is periodic in x with period ``lx``.  Array shapes are unchanged
    — lattices with nx+1 columns keep a duplicated seam column (col nx is
    the same physical node as col 0); solution-like arrays hold equal values
    in both seam columns, while operator outputs / RHS / residuals follow
    the HALF-ROW convention (each seam column carries half the physical
    equation), which keeps the embedded operator exactly symmetric under
    the full-array dot product.  See ops/stokes.py.
    """

    top: str = FREE_SLIP
    bottom: str = FREE_SLIP
    left: str = FREE_SLIP
    right: str = FREE_SLIP
    vn_top: float = 0.0
    vn_bottom: float = 0.0
    vn_left: float = 0.0
    vn_right: float = 0.0
    # Prescribed tangential wall velocities (moving no-slip walls, e.g.
    # lid-driven / plate-velocity experiments).  Only meaningful on no-slip
    # walls; the affine ghost contribution enters the RHS (stokes_rhs), the
    # operator keeps homogeneous ghosts and stays linear.
    vt_top: float = 0.0
    vt_bottom: float = 0.0
    vt_left: float = 0.0
    vt_right: float = 0.0

    def __post_init__(self):
        if (self.left == PERIODIC) != (self.right == PERIODIC):
            raise ValueError(
                "periodic side BCs must be set on BOTH left and right"
            )
        if self.top == PERIODIC or self.bottom == PERIODIC:
            raise ValueError(
                "periodic BCs are supported on the side walls only "
                "(top/bottom must be free_slip or no_slip)"
            )
        if self.periodic_x and (
            self.vn_left != 0.0
            or self.vn_right != 0.0
            or self.vt_left != 0.0
            or self.vt_right != 0.0
        ):
            raise ValueError("periodic side walls take no prescribed velocities")

    @property
    def periodic_x(self) -> bool:
        return self.left == PERIODIC

    def _sign(self, wall: str) -> float:
        kind = getattr(self, wall)
        if kind == FREE_SLIP:
            return 1.0
        if kind == NO_SLIP:
            return -1.0
        if kind == PERIODIC:
            raise ValueError(
                f"wall {wall!r} is periodic: it has no ghost sign "
                "(use the wrap-around stencil path)"
            )
        raise ValueError(f"unknown velocity BC {kind!r} on wall {wall!r}")

    @property
    def s_top(self):
        return self._sign("top")

    @property
    def s_bottom(self):
        return self._sign("bottom")

    @property
    def s_left(self):
        return self._sign("left")

    @property
    def s_right(self):
        return self._sign("right")


@dataclasses.dataclass(frozen=True)
class ThermalBC:
    """One wall: kind in {"dirichlet", "neumann", "periodic"};
    value = T or flux (q/k); ignored for periodic."""

    kind: str = NEUMANN
    value: float = 0.0


@dataclasses.dataclass(frozen=True)
class ThermalBCs:
    top: ThermalBC = ThermalBC(DIRICHLET, 0.0)
    bottom: ThermalBC = ThermalBC(DIRICHLET, 1.0)
    left: ThermalBC = ThermalBC(NEUMANN, 0.0)
    right: ThermalBC = ThermalBC(NEUMANN, 0.0)

    def __post_init__(self):
        if (self.left.kind == PERIODIC) != (self.right.kind == PERIODIC):
            raise ValueError(
                "periodic thermal BCs must be set on BOTH left and right"
            )
        if self.top.kind == PERIODIC or self.bottom.kind == PERIODIC:
            raise ValueError("periodic thermal BCs are side-wall only")

    @property
    def periodic_x(self) -> bool:
        return self.left.kind == PERIODIC
