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

    def _sign(self, wall: str) -> float:
        kind = getattr(self, wall)
        if kind == FREE_SLIP:
            return 1.0
        if kind == NO_SLIP:
            return -1.0
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
    """One wall: kind in {"dirichlet", "neumann"}; value = T or flux (q/k)."""

    kind: str = NEUMANN
    value: float = 0.0


@dataclasses.dataclass(frozen=True)
class ThermalBCs:
    top: ThermalBC = ThermalBC(DIRICHLET, 0.0)
    bottom: ThermalBC = ThermalBC(DIRICHLET, 1.0)
    left: ThermalBC = ThermalBC(NEUMANN, 0.0)
    right: ThermalBC = ThermalBC(NEUMANN, 0.0)
