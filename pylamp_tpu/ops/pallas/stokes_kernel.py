"""Pallas TPU kernel: fused variable-viscosity momentum-operator application.

This is the hot stencil of the whole framework: the multigrid smoother
applies it ~10x per Krylov iteration (SURVEY.md §7.2 step 7 "Pallas stencil
fusion").  The jnp implementation materializes the ghost concatenations and
the three stress fields in HBM; this kernel streams row blocks through VMEM
and computes

    rx = -(d sxx/dx + d sxy/dy)     (+ kbnd on the wall-normal columns)
    ry = -(d sxy/dx + d syy/dy)     (+ kbnd on the wall-normal rows)

in a single pass.  Inputs are pre-padded with their BC ghost rows/columns on
the host side (cheap concats) so every block's halo read is a static-size
`pl.ds` slice:

    vxg  = (ny+2, nx+1)  vx with ghost rows (free slip +, no slip -)
    vyg2 = (ny+3, nx+2)  vy with ghost cols AND one zero row top+bottom
    esp  = (ny+2, nx+1)  eta_s with one zero row at the bottom
    enp  = (ny+2, nx)    eta_n with one zero row top+bottom

Inputs stay in HBM (`pl.ANY`) and are DMA'd per block; outputs are
written through disjoint VMEM row blocks.  float32 only (it runs inside the
f32 inner solves of the mixed-precision scheme).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid


def _kernel(vxg_hbm, vyg2_hbm, esp_hbm, enp_hbm, rx_ref, ry_ref,
            vxg_b2, vyg2_b2, esp_b2, enp_b2, sems, *, br, grid, kbnd_s,
            periodic_x=False):
    ny, nx = grid.ny, grid.nx
    dx = grid.dx
    dy = grid.dy
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    r0 = i * br
    # Manual HBM->VMEM DMAs must be tile-aligned: (8-row, 128-lane)
    # slices for f32.  The host pre-pads every array to (ny+8, W128);
    # the kernel reads only the leading (br+2, true-width) window.
    #
    # Double buffering: VMEM scratch persists across the (sequential)
    # TPU grid steps, so program i prefetches block i+1's four DMAs
    # into the other slot while computing on block i — the HBM streams
    # overlap the stencil arithmetic instead of serializing before it
    # (the round-1 kernel's start-all/wait-all lost its A/B to XLA
    # exactly here).
    # all indices must stay i32: under jax_enable_x64 bare python ints
    # trace as i64, which Mosaic's memref slicing rejects
    idx = [jnp.int32(v) for v in range(4)]

    def dmas(slot, blk):
        row = blk * jnp.int32(br)
        return (
            pltpu.make_async_copy(
                vxg_hbm.at[pl.ds(row, br + 8)], vxg_b2.at[slot], sems.at[slot, idx[0]]
            ),
            pltpu.make_async_copy(
                vyg2_hbm.at[pl.ds(row, br + 8)], vyg2_b2.at[slot], sems.at[slot, idx[1]]
            ),
            pltpu.make_async_copy(
                esp_hbm.at[pl.ds(row, br + 8)], esp_b2.at[slot], sems.at[slot, idx[2]]
            ),
            pltpu.make_async_copy(
                enp_hbm.at[pl.ds(row, br + 8)], enp_b2.at[slot], sems.at[slot, idx[3]]
            ),
        )

    # int32 literals: program_id is i32 and x64 mode promotes bare python
    # ints to i64, which Mosaic rejects
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

    vxg = vxg_b2[slot, :, : nx + 1]
    vyg2 = vyg2_b2[slot, :, : nx + 2]
    esp = esp_b2[slot, :, : nx + 1]
    enp = enp_b2[slot, :, :nx]

    # Local row indexing (block-relative):
    #   vxg[k]  = global vx ghost row r0 + k          (vx row j -> k = j - r0 + 1)
    #   vyg2[k] = global vy ghost row r0 + k - 1      (vy row j -> k = j - r0 + 1)
    #   esp[k]  = eta_s row r0 + k                    (row J  -> k = J - r0)
    #   enp[k]  = eta_n row r0 + k - 1                (row j  -> k = j - r0 + 1)

    # sxy on corner rows J = r0 .. r0+br  (local esp rows 0..br):
    #   sxy[J] = es[J] * ((vxg[J+1] - vxg[J])/dy + (vyg[:,1:] - vyg[:,:-1])/dx)
    # with vxg local k = J - r0 (+1 for J+1), vyg row J -> vyg2 local J - r0 + 1.
    vx_lo = vxg[0 : br + 1, :]
    vx_hi = vxg[1 : br + 2, :]
    vy_mid = vyg2[1 : br + 2, :]
    sxy = esp[0 : br + 1, :] * (
        (vx_hi - vx_lo) / dy + (vy_mid[:, 1:] - vy_mid[:, :-1]) / dx
    )  # rows J = r0 .. r0+br  -> (br+1, nx+1)

    # sxx on vx rows j = r0 .. r0+br-1 (cell rows): vx row j -> vxg k = j-r0+1
    vx_c = vxg[1 : br + 1, :]  # (br, nx+1)
    en_c = enp[1 : br + 1, :]  # eta_n rows j  -> (br, nx)
    sxx = 2.0 * en_c * (vx_c[:, 1:] - vx_c[:, :-1]) / dx  # (br, nx)

    # rx rows j = r0 .. r0+br-1
    rx_int = (
        -(sxx[:, 1:] - sxx[:, :-1]) / dx
        - (sxy[1 : br + 1, 1:-1] - sxy[0:br, 1:-1]) / dy
    )  # (br, nx-1)
    kb = kbnd_s[0]
    if periodic_x:
        # Seam momentum row (vx columns 0 and nx are one physical node):
        # wrapped stencil under the HALF-ROW convention (ops/stokes.py),
        # emitted into both duplicate columns.
        rx_seam = 0.5 * (
            -(sxx[:, :1] - sxx[:, -1:]) / dx
            - (sxy[1 : br + 1, :1] - sxy[0:br, :1]) / dy
        )
        rx = jnp.concatenate([rx_seam, rx_int, rx_seam], axis=1)
    else:
        rx = jnp.concatenate(
            [kb * vx_c[:, :1], rx_int, kb * vx_c[:, -1:]], axis=1
        )
    rx_ref[:, :] = rx

    # syy on cell rows j = r0-1 .. r0+br-1 (needed for ry rows r0..r0+br-1):
    #   syy[j] = 2 en[j] * (vy[j+1] - vy[j])/dy ; vy row j -> vyg2 k = j-r0+1
    vy_all = vyg2[:, 1:-1]  # strip ghost cols -> vy rows r0-1 .. r0+br
    syy = 2.0 * enp[0 : br + 1, :] * (vy_all[1 : br + 2, :] - vy_all[0 : br + 1, :]) / dy
    # rows j = r0-1 .. r0+br-1 -> (br+1, nx)

    # ry rows j = r0 .. r0+br-1: -(syy[j]-syy[j-1])/dy - (sxy[j,i+1]-sxy[j,i])/dx
    sxy_row = sxy[0:br, :]  # corner rows J = r0 .. r0+br-1
    ry_all = (
        -(syy[1 : br + 1, :] - syy[0:br, :]) / dy
        - (sxy_row[:, 1:] - sxy_row[:, :-1]) / dx
    )  # (br, nx)
    # Dirichlet row j == 0 (the j == ny row is appended outside the
    # kernel: the blocked output covers vy rows 0 .. ny-1 only)
    grow = r0 + lax.broadcasted_iota(jnp.int32, (br, nx), 0)
    vy_c = vy_all[1 : br + 1, :]  # vy rows r0 .. r0+br-1
    ry_ref[:, :] = jnp.where(grow == 0, kb * vy_c, ry_all)



def _pad_rows_to(a, rows, w128):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, w128 - a.shape[1])))


def prep_eta_pallas(eta_s, eta_n, grid: StaggeredGrid):
    """Pre-pad the viscosity arrays for ``momentum_apply_pallas``.

    The viscosities are frozen for the duration of a Stokes solve while
    the kernel applies ~1000x; hoisting their ghost/pad copies out of the
    apply (multigrid levels precompute this once per solve) removes ~40%
    of the wrapper's per-apply HBM traffic."""
    ny, nx = grid.ny, grid.nx
    f32 = jnp.float32
    w128 = -(-(nx + 2) // 128) * 128
    esp = _pad_rows_to(eta_s.astype(f32), ny + 8, w128)
    zen = jnp.zeros((1, nx), f32)
    enp = _pad_rows_to(jnp.concatenate([zen, eta_n.astype(f32)], axis=0), ny + 8, w128)
    return esp, enp


def momentum_apply_pallas(
    vx, vy, eta_s, eta_n, grid: StaggeredGrid, bcs: VelocityBCs, kbnd,
    block_rows: int = 128, interpret: bool = False, eta_prepped=None,
):
    """Fused (rx, ry) momentum application; f32; ny must be divisible by
    block_rows (callers fall back to the jnp path otherwise).

    ``eta_prepped``: optional (esp, enp) from ``prep_eta_pallas`` — pass it
    when the viscosity is constant over many applies (Krylov/MG loops)."""
    ny, nx = grid.ny, grid.nx
    br = min(block_rows, ny)
    assert ny % br == 0, (ny, br)

    f32 = jnp.float32
    vx = vx.astype(f32)
    vy = vy.astype(f32)

    w128 = -(-(nx + 2) // 128) * 128

    # every source array is padded to ny+8 rows so each block's 8-aligned
    # (br+8)-row DMA stays in bounds
    vxg = jnp.concatenate([bcs.s_top * vx[:1], vx, bcs.s_bottom * vx[-1:]], axis=0)
    vxg = _pad_rows_to(vxg, ny + 8, w128)
    if bcs.periodic_x:
        vyg = jnp.concatenate([vy[:, -1:], vy, vy[:, :1]], axis=1)
    else:
        vyg = jnp.concatenate(
            [bcs.s_left * vy[:, :1], vy, bcs.s_right * vy[:, -1:]], axis=1
        )
    zrow = jnp.zeros((1, nx + 2), f32)
    vyg2 = _pad_rows_to(jnp.concatenate([zrow, vyg, zrow], axis=0), ny + 8, w128)
    if eta_prepped is None:
        esp, enp = prep_eta_pallas(eta_s, eta_n, grid)
    else:
        esp, enp = eta_prepped

    kbnd_s = jnp.asarray([kbnd], f32)


    # kbnd enters as a scalar-prefetch argument
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny // br,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # NB: `i * 0` keeps the column index i32 (a literal 0 traces as
            # i64 under jax_enable_x64 and fails Mosaic legalization)
            pl.BlockSpec((br, nx + 1), lambda i, *_: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, nx), lambda i, *_: (i, i * 0), memory_space=pltpu.VMEM),
        ],
        # grid-persistent double buffers: program i prefetches block i+1
        scratch_shapes=[
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    def kernel_fn(kbnd_ref, vxg_h, vyg2_h, esp_h, enp_h, rx_ref, ry_ref,
                  vxg_b2, vyg2_b2, esp_b2, enp_b2, sems):
        _kernel(vxg_h, vyg2_h, esp_h, enp_h, rx_ref, ry_ref,
                vxg_b2, vyg2_b2, esp_b2, enp_b2, sems,
                br=br, grid=grid, kbnd_s=kbnd_ref,
                periodic_x=bcs.periodic_x)

    rx, ry_main = pl.pallas_call(
        kernel_fn,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ny, nx + 1), f32),
            jax.ShapeDtypeStruct((ny, nx), f32),
        ],
        interpret=interpret,
        # the fixed 128-row blocks overflow the default 16 MB scoped
        # guardrail at nx >= 2048 (measured: saddle variant wants 21.3 MB
        # stack + 23.6 MB scratch); raise only where needed — an
        # unconditional raise was implicated in compile-helper crashes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ) if (nx >= 2048 and not interpret) else None,
    )(kbnd_s, vxg, vyg2, esp, enp)
    # bottom-wall Dirichlet row (vy row ny)
    ry = jnp.concatenate([ry_main, kbnd_s[0] * vy[-1:, :]], axis=0)
    return rx, ry


# -- fused full saddle-point application --------------------------------------
#
# The FGMRES outer loop applies the FULL Stokes operator (momentum rows +
# pressure gradient + continuity) once per iteration.  The jnp path
# materializes the ghost concats and stress fields in HBM and lowers to many
# small kernels (measured 1.45 ms at 1024^2 on v5e — ~30x the HBM lower
# bound); this kernel computes (rx, ry, rc) in the same double-buffered
# row-block pass as the momentum kernel above, adding the p stream.

def _saddle_kernel(vxg_hbm, vyg2_hbm, esp_hbm, enp_hbm, pp_hbm,
                   rx_ref, ry_ref, rc_ref,
                   vxg_b2, vyg2_b2, esp_b2, enp_b2, pp_b2, sems,
                   *, br, grid, scal, periodic_x=False):
    ny, nx = grid.ny, grid.nx
    dx = grid.dx
    dy = grid.dy
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    r0 = i * br
    idx = [jnp.int32(v) for v in range(5)]

    def dmas(slot, blk):
        row = blk * jnp.int32(br)
        return (
            pltpu.make_async_copy(
                vxg_hbm.at[pl.ds(row, br + 8)], vxg_b2.at[slot], sems.at[slot, idx[0]]
            ),
            pltpu.make_async_copy(
                vyg2_hbm.at[pl.ds(row, br + 8)], vyg2_b2.at[slot], sems.at[slot, idx[1]]
            ),
            pltpu.make_async_copy(
                esp_hbm.at[pl.ds(row, br + 8)], esp_b2.at[slot], sems.at[slot, idx[2]]
            ),
            pltpu.make_async_copy(
                enp_hbm.at[pl.ds(row, br + 8)], enp_b2.at[slot], sems.at[slot, idx[3]]
            ),
            pltpu.make_async_copy(
                pp_hbm.at[pl.ds(row, br + 8)], pp_b2.at[slot], sems.at[slot, idx[4]]
            ),
        )

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

    vxg = vxg_b2[slot, :, : nx + 1]
    vyg2 = vyg2_b2[slot, :, : nx + 2]
    esp = esp_b2[slot, :, : nx + 1]
    enp = enp_b2[slot, :, :nx]
    pp = pp_b2[slot, :, :nx]  # p rows: local k = j - r0 + 1 (like enp)

    vx_lo = vxg[0 : br + 1, :]
    vx_hi = vxg[1 : br + 2, :]
    vy_mid = vyg2[1 : br + 2, :]
    sxy = esp[0 : br + 1, :] * (
        (vx_hi - vx_lo) / dy + (vy_mid[:, 1:] - vy_mid[:, :-1]) / dx
    )

    vx_c = vxg[1 : br + 1, :]
    en_c = enp[1 : br + 1, :]
    dvxdx = (vx_c[:, 1:] - vx_c[:, :-1]) / dx  # (br, nx)
    sxx = 2.0 * en_c * dvxdx

    p_c = pp[1 : br + 1, :]  # p rows r0 .. r0+br-1
    kb = scal[0]
    kcont = scal[1]
    rx_int = (
        -(sxx[:, 1:] - sxx[:, :-1]) / dx
        - (sxy[1 : br + 1, 1:-1] - sxy[0:br, 1:-1]) / dy
        + (p_c[:, 1:] - p_c[:, :-1]) / dx
    )
    if periodic_x:
        # wrapped seam column under the half-row convention (ops/stokes.py)
        rx_seam = 0.5 * (
            -(sxx[:, :1] - sxx[:, -1:]) / dx
            - (sxy[1 : br + 1, :1] - sxy[0:br, :1]) / dy
            + (p_c[:, :1] - p_c[:, -1:]) / dx
        )
        rx_ref[:, :] = jnp.concatenate([rx_seam, rx_int, rx_seam], axis=1)
    else:
        rx_ref[:, :] = jnp.concatenate(
            [kb * vx_c[:, :1], rx_int, kb * vx_c[:, -1:]], axis=1
        )

    vy_all = vyg2[:, 1:-1]
    syy = 2.0 * enp[0 : br + 1, :] * (vy_all[1 : br + 2, :] - vy_all[0 : br + 1, :]) / dy

    sxy_row = sxy[0:br, :]
    ry_all = (
        -(syy[1 : br + 1, :] - syy[0:br, :]) / dy
        - (sxy_row[:, 1:] - sxy_row[:, :-1]) / dx
        + (pp[1 : br + 1, :] - pp[0:br, :]) / dy
    )
    grow = r0 + lax.broadcasted_iota(jnp.int32, (br, nx), 0)
    vy_c = vy_all[1 : br + 1, :]
    ry_ref[:, :] = jnp.where(grow == 0, kb * vy_c, ry_all)

    dvydy = (vy_all[2 : br + 2, :] - vy_all[1 : br + 1, :]) / dy  # cell rows
    rc_ref[:, :] = kcont * (dvxdx + dvydy)


def saddle_apply_eligible(grid: StaggeredGrid, dtype, bcs: VelocityBCs) -> bool:
    """f32, TPU, row count divisible by the 128-row block.  Periodic-x is
    supported: the kernel emits the wrapped half-convention seam columns
    (round-3 verdict item 6 — periodic runs keep the fused outer apply)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return (
        dtype == jnp.float32
        and grid.uniform
        and grid.ny % 128 == 0
        and grid.nx >= 256
        and platform not in ("cpu", "gpu")
    )


def saddle_apply_pallas(
    vx, vy, p, eta_s, eta_n, grid: StaggeredGrid, bcs: VelocityBCs,
    kcont, kbnd, block_rows: int = 128, interpret: bool = False,
    eta_prepped=None,
):
    """Fused (rx, ry, rc) full Stokes application; f32; same layout contract
    as ``momentum_apply_pallas`` plus the pressure stream (padded like
    eta_n: one zero row on top)."""
    ny, nx = grid.ny, grid.nx
    br = min(block_rows, ny)
    assert ny % br == 0, (ny, br)

    f32 = jnp.float32
    vx = vx.astype(f32)
    vy = vy.astype(f32)
    p = p.astype(f32)

    w128 = -(-(nx + 2) // 128) * 128

    vxg = jnp.concatenate([bcs.s_top * vx[:1], vx, bcs.s_bottom * vx[-1:]], axis=0)
    vxg = _pad_rows_to(vxg, ny + 8, w128)
    if bcs.periodic_x:
        vyg = jnp.concatenate([vy[:, -1:], vy, vy[:, :1]], axis=1)
    else:
        vyg = jnp.concatenate(
            [bcs.s_left * vy[:, :1], vy, bcs.s_right * vy[:, -1:]], axis=1
        )
    zrow = jnp.zeros((1, nx + 2), f32)
    vyg2 = _pad_rows_to(jnp.concatenate([zrow, vyg, zrow], axis=0), ny + 8, w128)
    zp = jnp.zeros((1, nx), f32)
    pp = _pad_rows_to(jnp.concatenate([zp, p], axis=0), ny + 8, w128)
    if eta_prepped is None:
        esp, enp = prep_eta_pallas(eta_s, eta_n, grid)
    else:
        esp, enp = eta_prepped

    scal = jnp.asarray([kbnd, kcont], f32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny // br,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[
            pl.BlockSpec((br, nx + 1), lambda i, *_: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, nx), lambda i, *_: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, nx), lambda i, *_: (i, i * 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.VMEM((2, br + 8, w128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )

    def kernel_fn(scal_ref, vxg_h, vyg2_h, esp_h, enp_h, pp_h,
                  rx_ref, ry_ref, rc_ref,
                  vxg_b2, vyg2_b2, esp_b2, enp_b2, pp_b2, sems):
        _saddle_kernel(vxg_h, vyg2_h, esp_h, enp_h, pp_h,
                       rx_ref, ry_ref, rc_ref,
                       vxg_b2, vyg2_b2, esp_b2, enp_b2, pp_b2, sems,
                       br=br, grid=grid, scal=scal_ref,
                       periodic_x=bcs.periodic_x)

    rx, ry_main, rc = pl.pallas_call(
        kernel_fn,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ny, nx + 1), f32),
            jax.ShapeDtypeStruct((ny, nx), f32),
            jax.ShapeDtypeStruct((ny, nx), f32),
        ],
        interpret=interpret,
        # see momentum_apply_pallas: 21.3 MB Mosaic stack at nx = 2048
        # with the fixed 128-row blocks; raise the 16 MB guardrail only
        # where needed
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ) if (nx >= 2048 and not interpret) else None,
    )(scal, vxg, vyg2, esp, enp, pp)
    ry = jnp.concatenate([ry_main, scal[0] * vy[-1:, :]], axis=0)
    return rx, ry, rc
