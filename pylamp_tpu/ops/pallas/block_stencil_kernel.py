"""Pallas TPU kernel: per-shard saddle/momentum stencil on halo-extended blocks.

Round-4 verdict item 1: the fused stencil kernels (ops/pallas/stokes_kernel)
were gated ``halo_mesh is None`` — on a device mesh the dominant Stokes
phase fell back to unfused XLA stencils.  Each explicit-halo ``shard_map``
body is a single-device program (the same argument that legalized the
marker kernels in parallel/halo_markers.py), so the stencil itself can run
as a Pallas kernel per shard.

This kernel consumes the one-deep halo-extended blocks the shard body
already builds (parallel/halo_ops.stokes_operator_halo ``local()``):

    vx_ext (by+2, bx+2)   vx block + ppermute/BC-ghost ring
    vy_ext (by+2, bx+2)
    p_ext  (by+2, bx+2)   cell-centred ring halo
    es_ext (by+1, bx+1)   corner viscosity + next-block row/col
    en_ext (by+2, bx+2)   cell-centred ring halo

and emits the PURE-INTERIOR stencil outputs (rx, ry, rc) of shape
(by, bx) — identical algebra to the jnp section of ``local()``.  All BC
semantics live in the extended inputs (the shard body fills wall ghosts)
and in the Dirichlet row patches the shard body applies afterwards, so the
kernel needs no boundary logic at all; the junk halo lanes it reads at
physical walls land only on rows/cols the caller overwrites.

Same streaming structure as ops/pallas/stokes_kernel.py: row blocks with
double-buffered HBM->VMEM DMAs so block i+1's streams overlap block i's
arithmetic.  f32 only (the mixed-precision inner-solve hot path).

Equivalence is asserted in tests/test_halo_stencil_pallas.py (interpret
mode on the 8-virtual-device CPU mesh, against both the jnp explicit-halo
path and the global operator).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scal_ref, vx_h, vy_h, p_h, es_h, en_h, *outs_and_scratch,
            br, bx, dx, dy, with_p):
    """Window row maps (padded row p = block-local extended row p, where
    extended row 0 = local row -1 for vx/vy/en/p; the es stream has one
    zero row prepended so its padded row p = corner row p-1):

      block i computes output rows j in [i*br, i*br + br); its window
      covers padded rows [i*br, i*br + br + 2), DMA'd as br + 8 rows.

      window row w:  vx/vy local row  i*br + w - 1
                     cell (en, p) row i*br + w - 1
                     corner (es) row i*br + w - 1
    """
    if with_p:
        (rx_ref, ry_ref, rc_ref,
         vx_b2, vy_b2, p_b2, es_b2, en_b2, sems) = outs_and_scratch
        n_in = 5
    else:
        (rx_ref, ry_ref,
         vx_b2, vy_b2, es_b2, en_b2, sems) = outs_and_scratch
        p_b2 = None
        n_in = 4
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    idx = [jnp.int32(v) for v in range(n_in)]

    def dmas(slot, blk):
        row = blk * jnp.int32(br)
        hbms = (vx_h, vy_h, es_h, en_h) + ((p_h,) if with_p else ())
        bufs = (vx_b2, vy_b2, es_b2, en_b2) + ((p_b2,) if with_p else ())
        return [
            pltpu.make_async_copy(h.at[pl.ds(row, br + 8)], b.at[slot],
                                  sems.at[slot, idx[n]])
            for n, (h, b) in enumerate(zip(hbms, bufs))
        ]

    one, two = jnp.int32(1), jnp.int32(2)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + one, two)

    @pl.when(i == 0)
    def _():
        for c in dmas(slot, i):
            c.start()

    @pl.when(i + one < nb)
    def _():
        for c in dmas(nslot, i + one):
            c.start()

    for c in dmas(slot, i):
        c.wait()

    vxw = vx_b2[slot, : br + 2, : bx + 2]
    vyw = vy_b2[slot, : br + 2, : bx + 2]
    esw = es_b2[slot, : br + 2, : bx + 1]
    enw = en_b2[slot, : br + 2, : bx + 2]

    # sxy at corner rows J = i*br + w - 1, w = 1..br+1: vx rows J-1 (w-1)
    # and J (w), vy row J (w)
    sxy = esw[1 : br + 2, :] * (
        (vxw[1 : br + 2, 1:] - vxw[0 : br + 1, 1:]) / dy
        + (vyw[1 : br + 2, 1:] - vyw[1 : br + 2, :-1]) / dx
    )  # (br+1, bx+1): row r = corner row i*br + r

    dvxdx = (vxw[:, 1:] - vxw[:, :-1]) / dx  # (br+2, bx+1), cell row at w
    sxx = 2.0 * enw[:, :-1] * dvxdx

    dvydy = (vyw[1 : br + 2, :] - vyw[0 : br + 1, :]) / dy  # (br+1, bx+2)
    syy = 2.0 * enw[0 : br + 1, :] * dvydy  # cell row i*br + w - 1 at w

    # rx at local rows j = i*br .. i*br+br-1 (w = j - i*br + 1):
    #   -(sxx[j, c] - sxx[j, c-1])/dx - (sxy[J=j+1, c] - sxy[J=j, c])/dy
    #   (+ (p[j, c] - p[j, c-1])/dx)
    rx = (
        -(sxx[1 : br + 1, 1:] - sxx[1 : br + 1, :-1]) / dx
        - (sxy[1:, :-1] - sxy[:-1, :-1]) / dy
    )  # (br, bx)
    # ry at vy rows j: -(syy[j] - syy[j-1])/dy - (sxy[J=j, c+1] - sxy[J=j, c])/dx
    ry = (
        -(syy[1 : br + 1, 1:-1] - syy[0:br, 1:-1]) / dy
        - (sxy[0:br, 1:] - sxy[0:br, :-1]) / dx
    )  # (br, bx)
    if with_p:
        pw = p_b2[slot, : br + 2, : bx + 2]
        rx = rx + (pw[1 : br + 1, 1 : bx + 1] - pw[1 : br + 1, 0:bx]) / dx
        ry = ry + (pw[1 : br + 1, 1 : bx + 1] - pw[0:br, 1 : bx + 1]) / dy
        kcont = scal_ref[0]
        rc_ref[:, :] = kcont * (
            dvxdx[1 : br + 1, 1:] + dvydy[1 : br + 1, 1 : bx + 1]
        )
    rx_ref[:, :] = rx
    ry_ref[:, :] = ry


def _pick_block_rows(by: int, bx: int):
    """Largest block height whose double-buffered streams + outputs fit the
    default scoped-VMEM guardrail (same calibrated model family as the
    sibling kernels: streams x2 slots + outputs, x1.6 Mosaic temporaries)."""
    w128 = -(-(bx + 2) // 128) * 128
    for br in (128, 64, 32, 16, 8):
        if by % br:
            continue
        vmem = (2 * 5 * (br + 8) + 3 * br) * w128 * 4
        if vmem * 1.6 <= 15.5 * 1024 * 1024:
            return br
    return None


def block_stencil_eligible(by: int, bx: int, dtype,
                           interpret: bool = False) -> bool:
    """Per-shard eligibility: f32 blocks with 8-aligned heights big enough
    to amortize the DMA machinery.  ``interpret`` bypasses the platform and
    size gates so CPU-mesh equivalence tests cover the kernel math."""
    if dtype != jnp.float32:
        return False
    if by % 8 != 0 or _pick_block_rows(by, bx) is None:
        return False
    if interpret:
        return True
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return bx >= 128 and by >= 64 and platform not in ("cpu", "gpu")


def _pad(a, rows, w128):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, w128 - a.shape[1])))


def saddle_block_pallas(vx_ext, vy_ext, p_ext, es_ext, en_ext, grid,
                        kcont=1.0, with_p: bool = True,
                        interpret: bool = False):
    """Fused per-shard stencil on halo-extended blocks; returns
    (rx, ry, rc) of shape (by, bx), or (rx, ry) with ``with_p=False``
    (the momentum-only form the MG smoothers apply).  f32 only."""
    by = vx_ext.shape[0] - 2
    bx = vx_ext.shape[1] - 2
    f32 = jnp.float32
    br = _pick_block_rows(by, bx)
    assert br is not None and by % br == 0, (by, bx, br)
    w128 = -(-(bx + 2) // 128) * 128
    rows = by + 8

    vxp = _pad(vx_ext.astype(f32), rows, w128)
    vyp = _pad(vy_ext.astype(f32), rows, w128)
    # one zero row on top puts corner row J at padded row J+1 (common frame)
    esp = _pad(jnp.pad(es_ext.astype(f32), ((1, 0), (0, 0))), rows, w128)
    enp = _pad(en_ext.astype(f32), rows, w128)

    scal = jnp.asarray([kcont], f32)
    nb = by // br
    out_spec = pl.BlockSpec((br, bx), lambda i, *_: (i, i * 0),
                            memory_space=pltpu.VMEM)
    n_out = 3 if with_p else 2
    n_in = 5 if with_p else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, br + 8, w128), f32) for _ in range(n_in)
        ] + [pltpu.SemaphoreType.DMA((2, n_in))],
    )

    def kfn(scal_ref, *args):
        if with_p:
            vx_h, vy_h, p_h, es_h, en_h = args[:5]
            rest = args[5:]
        else:
            vx_h, vy_h, es_h, en_h = args[:4]
            p_h = None
            rest = args[4:]
        _kernel(scal_ref, vx_h, vy_h, p_h, es_h, en_h, *rest,
                br=br, bx=bx, dx=grid.dx, dy=grid.dy, with_p=with_p)

    ins = (vxp, vyp) + ((_pad(p_ext.astype(f32), rows, w128),) if with_p
                        else ()) + (esp, enp)
    outs = pl.pallas_call(
        kfn,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb * br, bx), f32)] * n_out,
        interpret=interpret,
        # per-shard blocks at 2048^2 / 8 chips exceed the 16 MB default
        # scoped guardrail only via Mosaic temporaries; the model above
        # already sizes br against it, so no raise is needed here
    )(scal, *ins)
    if with_p:
        return outs[0][:by], outs[1][:by], outs[2][:by]
    return outs[0][:by], outs[1][:by]
