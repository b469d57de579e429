"""Explicit halo exchange under shard_map (SURVEY.md §2.3: the ring/torus
neighbor-exchange analogue of sequence parallelism, mapped onto
`lax.ppermute` over the ICI mesh).

The default multi-chip path lets GSPMD partition the jnp stencils and insert
the halo collectives automatically (parallel/mesh.py).  This module is the
explicit alternative for kernels where manual communication placement beats
the compiler: each device owns a block row/column of the grid, exchanges
one-deep halos with its mesh neighbors, and applies the stencil locally.

Currently provides the building blocks (halo push/pull on a 2-D mesh) plus
a manually-sharded 5-point variable-coefficient diffusion apply used by the
distributed tests to validate the mechanism against the single-device
operator."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _neighbor_perm(n, shift):
    """Non-periodic neighbor permutation along an axis of size n."""
    if shift > 0:
        return [(i, i + 1) for i in range(n - 1)]
    return [(i, i - 1) for i in range(1, n)]


def exchange_halo_2d(block, mesh: Mesh, axes=("y", "x")):
    """Return block padded by one ring of halo values exchanged with the
    4 mesh neighbors (edges at the physical domain boundary are zero-filled;
    callers overlay their own BC ghosts there).

    Must be called inside shard_map over ``axes``."""
    ay, ax = axes
    ny_dev = mesh.shape[ay]
    nx_dev = mesh.shape[ax]

    # rows from the device above/below (ppermute moves data along mesh axis)
    top_halo = lax.ppermute(block[-1:, :], ay, _neighbor_perm(ny_dev, +1))
    bot_halo = lax.ppermute(block[:1, :], ay, _neighbor_perm(ny_dev, -1))
    padded = jnp.concatenate([top_halo, block, bot_halo], axis=0)

    left_halo = lax.ppermute(padded[:, -1:], ax, _neighbor_perm(nx_dev, +1))
    right_halo = lax.ppermute(padded[:, :1], ax, _neighbor_perm(nx_dev, -1))
    return jnp.concatenate([left_halo, padded, right_halo], axis=1)


def diffusion_apply_sharded(T, kx, ky, rc, dx, dy, mesh: Mesh):
    """rc*T - div(k grad T) on a cell-centered block layout with zero-Dirichlet
    exterior, communicated explicitly.  T: (ny, nx) sharded P('y','x');
    kx/ky: face coefficient arrays of the same (ny, nx) shape (left/top
    faces); returns the operator application with identical sharding.

    Demonstrates/benchmarks the manual-halo path against GSPMD; the
    full-model operators keep the GSPMD path (it inserts equivalent
    collective-permutes)."""

    def local(Tb, kxb, kyb):
        Tp = exchange_halo_2d(Tb, mesh)

        kxp = exchange_halo_2d(kxb, mesh)
        kyp = exchange_halo_2d(kyb, mesh)

        # faces: kx[i] is the face between T[i-1] and T[i] (global sense)
        flux_x_l = kxp[1:-1, 1:-1] * (Tp[1:-1, 1:-1] - Tp[1:-1, :-2]) / dx
        flux_x_r = kxp[1:-1, 2:] * (Tp[1:-1, 2:] - Tp[1:-1, 1:-1]) / dx
        flux_y_u = kyp[1:-1, 1:-1] * (Tp[1:-1, 1:-1] - Tp[:-2, 1:-1]) / dy
        flux_y_d = kyp[2:, 1:-1] * (Tp[2:, 1:-1] - Tp[1:-1, 1:-1]) / dy
        div = (flux_x_r - flux_x_l) / dx + (flux_y_d - flux_y_u) / dy
        return rc * Tb - div

    spec = P("y", "x")
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(T, kx, ky)
