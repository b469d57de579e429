"""Fused per-shard Chebyshev smoother under the explicit-halo engine.

Completes round-4 verdict item 1: the single-device fused smoother
(ops/pallas/cheb_kernel.py) was gated off any mesh; this module runs the
SAME fused multi-iteration sweep per shard inside ``shard_map``, with ONE
depth-``h`` halo exchange per sweep call instead of four one-deep
exchanges per iteration (h = iters, or iters + 1 when the sweep also
emits its residual).  The deep-halo staleness argument and the frame
layout live in ops/pallas/cheb_block_kernel.py.

Wall ghost layers are pre-filled here (and re-derived every iteration
inside the kernel, gated by runtime wall flags — mesh position is traced
data inside shard_map).  The global Dirichlet seam lines the explicit-halo
layout keeps outside the block decomposition (vx column nx, vy row ny)
evolve by the same pointwise kbnd recurrence in two places that provably
agree: inside the frames of the shards that carry them (so near-seam
stencils read fresh values) and globally out here (to assemble the output
strips).

Viscosity frames are per-solve constants: ``prep_halo_smoother`` runs the
eta exchanges once per level per solve and the per-sweep call exchanges
only the four evolving fields.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.pallas.cheb_block_kernel import (
    block_smoother_eligible,
    cheb_block_pallas,
)
from pylamp_tpu.parallel.halo_ops import halo_eligible


def halo_smoother_eligible(grid: StaggeredGrid, mesh: Mesh,
                           bcs: VelocityBCs, dtype, iters: int,
                           emit_residual: bool = False,
                           interpret: bool = False) -> bool:
    """Per-level gate: even decomposition, non-periodic (the wrap seam's
    half-row convention is not frame-local yet), frame fits VMEM."""
    if bcs.periodic_x or not halo_eligible(grid, mesh):
        return False
    my, mx = mesh.shape["y"], mesh.shape["x"]
    by, bx = grid.ny // my, grid.nx // mx
    h = iters + (1 if emit_residual else 0)
    # halos deeper than a block would need multi-hop exchanges
    if h >= by or h >= bx:
        return False
    return block_smoother_eligible(by, bx, dtype, iters,
                                   emit_residual=emit_residual,
                                   interpret=interpret)


def _pp(x, axis, pairs):
    if not pairs:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis, pairs)


def _from_prev(x, axis, n):
    return _pp(x, axis, [(i, i + 1) for i in range(n - 1)])


def _from_next(x, axis, n):
    return _pp(x, axis, [(i, i - 1) for i in range(1, n)])


def _rep(a, n, axis=0):
    return jnp.concatenate([a] * n, axis=axis) if n > 0 else a[:0] if axis == 0 else a[:, :0]


def _zeros_rows(like, n):
    return jnp.zeros((n,) + like.shape[1:], like.dtype)


def _zeros_cols(like, n):
    return jnp.zeros(like.shape[:1] + (n,), like.dtype)


def prep_halo_smoother(eta_s, eta_n, grid: StaggeredGrid, mesh: Mesh,
                       h: int):
    """Build the per-shard viscosity frames once per solve.  Returns a
    shard_map-produced pair of per-device stacked frames — represented as
    GLOBAL arrays of block-stacked layout (my*Rs, mx*Cs) sharded P(y, x),
    where each shard's block IS its frame (frames overlap globally, so the
    stacked layout is the only shardable representation)."""
    my, mx = mesh.shape["y"], mesh.shape["x"]
    by, bx = grid.ny // my, grid.nx // mx
    f32 = eta_n.dtype

    def local(esI, esR, esB, esC, en):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")

        # -- es frame (R+1, C+1) --------------------------------------------
        t = _from_prev(esI[-h:, :], "y", my)
        t = jnp.where(iy == 0, _rep(esI[:1, :], h), t)
        b = _from_next(esI[: h + 1, :], "y", my)
        wall_b = jnp.concatenate([esB, _rep(esB, h)], axis=0)
        b = jnp.where(iy == my - 1, wall_b, b)
        rows_s = jnp.concatenate([t, esI, b], axis=0)  # (R+1, bx)

        tR = _from_prev(esR[-h:, :], "y", my)
        tR = jnp.where(iy == 0, _rep(esR[:1, :], h), tR)
        bR = _from_next(esR[: h + 1, :], "y", my)
        bR = jnp.where(iy == my - 1,
                       jnp.concatenate([esC, _rep(esC, h)], axis=0), bR)
        esR_ext = jnp.concatenate([tR, esR, bR], axis=0)  # (R+1, 1)

        l = _from_prev(rows_s[:, -h:], "x", mx)
        l = jnp.where(ix == 0, _rep(rows_s[:, :1], h, axis=1), l)
        r = _from_next(rows_s[:, : h + 1], "x", mx)
        wall_r = jnp.concatenate([esR_ext, _rep(esR_ext, h, axis=1)], axis=1)
        r = jnp.where(ix == mx - 1, wall_r, r)
        es_v = jnp.concatenate([l, rows_s, r], axis=1)  # (R+1, C+1)

        # -- en frame (R, C): edge-replicated ring --------------------------
        t = _from_prev(en[-h:, :], "y", my)
        t = jnp.where(iy == 0, _rep(en[:1, :], h), t)
        b = _from_next(en[:h, :], "y", my)
        b = jnp.where(iy == my - 1, _rep(en[-1:, :], h), b)
        rows_n = jnp.concatenate([t, en, b], axis=0)
        l = _from_prev(rows_n[:, -h:], "x", mx)
        l = jnp.where(ix == 0, _rep(rows_n[:, :1], h, axis=1), l)
        r = _from_next(rows_n[:, :h], "x", mx)
        r = jnp.where(ix == mx - 1, _rep(rows_n[:, -1:], h, axis=1), r)
        en_v = jnp.concatenate([l, rows_n, r], axis=1)

        return es_v, en_v

    blk = P("y", "x")
    es_v, en_v = shard_map(
        local,
        mesh=mesh,
        in_specs=(blk, P("y", None), P(None, "x"), P(None, None), blk),
        out_specs=(blk, blk),
        check_vma=False,
    )(
        eta_s[:-1, :-1].astype(f32), eta_s[:-1, -1:].astype(f32),
        eta_s[-1:, :-1].astype(f32), eta_s[-1:, -1:].astype(f32),
        eta_n.astype(f32),
    )
    return es_v, en_v, h


def chebyshev_smooth_halo(
    ex, ey, rx, ry, eta_s, eta_n, grid: StaggeredGrid, bcs: VelocityBCs,
    kbnd, lam_max, iters: int, mesh: Mesh, zero_init: bool = False,
    emit_residual: bool = False, interpret: bool = False, prepped=None,
):
    """Fused per-shard ``iters``-iteration Chebyshev sweep under the
    explicit-halo engine; drop-in for the jnp smoother body in
    solvers/mg.py smooth().  Returns (ex', ey') or
    (ex', ey', rx - A ex', ry - A ey')."""
    my, mx = mesh.shape["y"], mesh.shape["x"]
    ny, nx = grid.ny, grid.nx
    by, bx = ny // my, nx // mx
    f32 = jnp.float32
    ex = ex.astype(f32)
    ey = ey.astype(f32)
    rx = rx.astype(f32)
    ry = ry.astype(f32)
    kb = jnp.asarray(kbnd, f32)

    if prepped is None:
        prepped = prep_halo_smoother(
            eta_s, eta_n, grid, mesh, iters + (1 if emit_residual else 0))
    es_v, en_v, h = prepped
    # frames deeper than the sweep needs are fine (staleness reaches only
    # ``iters`` rings); shallower would contaminate the interior
    assert iters + (1 if emit_residual else 0) <= h, (iters, h)

    s_signs = (bcs.s_top, bcs.s_bottom, bcs.s_left, bcs.s_right)

    def local(exI, exR, rxI, rxR, eyI, eyB, ryI, ryB, es_f, en_f, lam):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")

        def ext_vx(I, Rcol, wall_fill: bool):
            """(R, C+1) vx-lattice frame: wall_fill=True derives the wall
            ghost layer (velocity); False leaves junk zeros (residuals)."""
            t = _from_prev(I[-h:, :], "y", my)
            b = _from_next(I[:h, :], "y", my)
            if wall_fill:
                wt_ = jnp.concatenate(
                    [_zeros_rows(I, h - 1), bcs.s_top * I[:1, :]], axis=0)
                wb_ = jnp.concatenate(
                    [bcs.s_bottom * I[-1:, :], _zeros_rows(I, h - 1)], axis=0)
            else:
                wt_ = _zeros_rows(I, h)
                wb_ = _zeros_rows(I, h)
            t = jnp.where(iy == 0, wt_, t)
            b = jnp.where(iy == my - 1, wb_, b)
            rows = jnp.concatenate([t, I, b], axis=0)  # (R, bx)

            tR = _from_prev(Rcol[-h:, :], "y", my)
            bR = _from_next(Rcol[:h, :], "y", my)
            if wall_fill:
                wtR = jnp.concatenate(
                    [_zeros_rows(Rcol, h - 1), bcs.s_top * Rcol[:1, :]],
                    axis=0)
                wbR = jnp.concatenate(
                    [bcs.s_bottom * Rcol[-1:, :], _zeros_rows(Rcol, h - 1)],
                    axis=0)
            else:
                wtR = _zeros_rows(Rcol, h)
                wbR = _zeros_rows(Rcol, h)
            tR = jnp.where(iy == 0, wtR, tR)
            bR = jnp.where(iy == my - 1, wbR, bR)
            R_ext = jnp.concatenate([tR, Rcol, bR], axis=0)  # (R, 1)

            l = _from_prev(rows[:, -h:], "x", mx)
            l = jnp.where(ix == 0, _zeros_cols(rows, h), l)
            r = _from_next(rows[:, : h + 1], "x", mx)
            wall_r = jnp.concatenate([R_ext, _zeros_cols(R_ext, h)], axis=1)
            r = jnp.where(ix == mx - 1, wall_r, r)
            return jnp.concatenate([l, rows, r], axis=1)  # (R, C+1)

        def ext_vy(I, Brow, wall_fill: bool):
            """(R+1, C) vy-lattice frame."""
            t = _from_prev(I[-h:, :], "y", my)
            t = jnp.where(iy == 0, _zeros_rows(I, h), t)
            b = _from_next(I[: h + 1, :], "y", my)
            wall_b = jnp.concatenate([Brow, _zeros_rows(Brow, h)], axis=0)
            b = jnp.where(iy == my - 1, wall_b, b)
            rows = jnp.concatenate([t, I, b], axis=0)  # (R+1, bx)

            l = _from_prev(rows[:, -h:], "x", mx)
            r = _from_next(rows[:, :h], "x", mx)
            if wall_fill:
                wl_ = jnp.concatenate(
                    [_zeros_cols(rows, h - 1), bcs.s_left * rows[:, :1]],
                    axis=1)
                wr_ = jnp.concatenate(
                    [bcs.s_right * rows[:, -1:], _zeros_cols(rows, h - 1)],
                    axis=1)
            else:
                wl_ = _zeros_cols(rows, h)
                wr_ = _zeros_cols(rows, h)
            l = jnp.where(ix == 0, wl_, l)
            r = jnp.where(ix == mx - 1, wr_, r)
            return jnp.concatenate([l, rows, r], axis=1)  # (R+1, C)

        ex_v = ext_vx(exI, exR, True)
        rx_v = ext_vx(rxI, rxR, False)
        ey_v = ext_vy(eyI, eyB, True)
        ry_v = ext_vy(ryI, ryB, False)

        wall_flags = (
            (iy == 0).astype(f32), (iy == my - 1).astype(f32),
            (ix == 0).astype(f32), (ix == mx - 1).astype(f32),
        )
        return cheb_block_pallas(
            ex_v, ey_v, rx_v, ry_v, es_f, en_f, by=by, bx=bx, h=h,
            grid=grid, kbnd=kb, s_signs=s_signs, wall_flags=wall_flags,
            lam_max=lam, iters=iters, zero_init=zero_init,
            emit_residual=emit_residual, interpret=interpret,
        )

    blk = P("y", "x")
    in_specs = (
        blk, P("y", None), blk, P("y", None),   # exI, exR, rxI, rxR
        blk, P(None, "x"), blk, P(None, "x"),   # eyI, eyB, ryI, ryB
        blk, blk,                               # es frame, en frame
        P(),                                    # lam_max
    )
    n_out = 4 if emit_residual else 2
    outs = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(blk,) * n_out,
        check_vma=False,  # pallas-in-shard_map
    )(
        ex[:, :-1], ex[:, -1:], rx[:, :-1], rx[:, -1:],
        ey[:-1, :], ey[-1:, :], ry[:-1, :], ry[-1:, :],
        es_v, en_v, jnp.asarray(lam_max, f32),
    )

    # -- seam strips: pointwise kbnd recurrence (identical to the in-frame
    # Dirichlet evolution, see module docstring) ------------------------------
    from pylamp_tpu.ops.pallas.cheb_kernel import chebyshev_coeffs

    coeffs = chebyshev_coeffs(jnp.asarray(lam_max, f32), iters)

    def seam_rec(s, r):
        d = jnp.zeros_like(s)
        for k in range(iters):
            c1, c2 = coeffs[k, 0], coeffs[k, 1]
            if zero_init and k == 0:
                d = c2 * r / kb
            else:
                d = c1 * d + c2 * (r - kb * s) / kb
            s = s + d
        return s

    sx = seam_rec(ex[:, -1:], rx[:, -1:])
    sy = seam_rec(ey[-1:, :], ry[-1:, :])

    ex_new = jnp.concatenate([outs[0], sx], axis=1)
    ey_new = jnp.concatenate([outs[1], sy], axis=0)
    if not emit_residual:
        return ex_new, ey_new
    rfx = jnp.concatenate([outs[2], rx[:, -1:] - kb * sx], axis=1)
    rfy = jnp.concatenate([outs[3], ry[-1:, :] - kb * sy], axis=0)
    return ex_new, ey_new, rfx, rfy
