"""Marker (Lagrangian tracer) state.

The reference stores markers as columns of one big array (position, material
id, T, properties; SURVEY.md §2.1).  Here MarkerState is a pytree of flat
(N,) arrays with a *static* capacity N — static shapes are required under
jit, and a fixed marker population is also what the reference uses (no
dynamic insertion/removal during a run)."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MarkerState:
    x: jnp.ndarray  # (N,)
    y: jnp.ndarray  # (N,)
    mat: jnp.ndarray  # (N,) int32 material id
    T: jnp.ndarray  # (N,) temperature

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)
