"""Pallas TPU kernel: fused multi-iteration Chebyshev momentum smoother.

The Chebyshev smoother is where the Stokes solve's HBM traffic goes: each
V-cycle runs `pre+post` degree-3 sweeps on the fine level, and the jnp
path pays ~12 full-field HBM passes per sweep iteration (stencil inputs,
recurrence state, updates).  This kernel runs ALL `iters <= 3` iterations
of one sweep VMEM-resident per row block with deep halos:

- each block DMAs a (br + 8)-row window of 6 streams (ex, ey ghosted;
  rx, ry; eta_s, eta_n) — the Jacobi diagonals are recomputed in VMEM
  from the viscosities (cheaper than streaming them);
- a halo of H = 3 rows per side makes the window exactly br + 8 rows
  (8-row DMA alignment for free) and lets 3 coupled stencil applications
  run back-to-back: after iteration k the outermost k window rows are
  stale, but staleness never reaches the central br rows (the classic
  deep-halo/temporal-blocking argument);
- at the DOMAIN walls staleness is avoided entirely by re-applying the
  tangential-BC ghost fix-up (ghost = s * first interior row / column)
  to the CURRENT values before every iteration, so boundary physics is
  exact on all iterations;
- the Chebyshev recurrence coefficients (c1_k, c2_k) are traced scalars
  (functions of the per-level lambda_max) passed via scalar prefetch.

Net effect: one sweep costs ~8 full-field passes instead of ~36 for a
degree-3 sweep (measured A/B in solvers/mg.py dispatch).  f32 only (the
mixed-precision inner-solve hot path).  Equivalence with the jnp smoother
is asserted by tests/test_cheb_kernel.py (interpret mode on CPU, to fp
tolerance — the recurrence is reassociated, not reordered).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid

H = 3  # default halo rows/side; window = br + 2H + 2 = br + 8 rows (aligned)
TOP = 4  # top zero-padding at the default halo (kept for callers)

# Supported halo depths: (2h + 2) % 8 == 0 keeps DMA alignment.  h = 11
# also lowers correctly (kernel + tests are depth-generic) but loses to the
# XLA smoother on v5e — 37% redundant halo rows at br=64: sticky-air
# degree-8 measured 0.942 s/step fused vs 0.856 jnp — so the dispatcher
# stops at 7 and deeper sweeps take the jnp path.
HS = (3, 7)


def _pick_h(iters: int):
    """Smallest supported halo depth that fuses ``iters`` coupled sweeps
    (staleness advances one row per iteration — module docstring)."""
    for h in HS:
        if iters <= h:
            return h
    return None


def _pick_block_rows(ny: int, nx: int, h: int, n_out: int = 2):
    """Largest block height whose kernel instance fits scoped VMEM.
    Model: 12 double-buffered stream windows + ``n_out`` double-buffered
    output blocks (2, or 4 with emit_residual), x1.56 for Mosaic
    temporaries (calibrated: 2048^2 h=7 br=64 models 10.6 MB and measures
    16.52 MB scoped).  The emit variant's final in-VMEM application keeps
    ~10 more window-sized planes live (stress tensors, ax/ay, residuals) —
    measured 21.3 MB at 2048^2 br=32 where the plain model said 11.3, so
    those planes enter the model explicitly."""
    w128 = -(-(nx + 2) // 128) * 128
    streams = 12 if n_out == 2 else 22
    # the emit variant raises the Mosaic scoped-vmem limit (the default
    # 16 MB guardrail, not a hardware bound — v5e has 128 MB VMEM) so big
    # grids keep the large block height; see chebyshev_smooth_pallas
    budget = 15.5 if n_out == 2 else 45.0
    mult = 1.56 if n_out == 2 else 1.6
    for br in (64, 32, 16, 8):
        if ny % br:
            continue
        vmem = (streams * (br + 2 * h + 2) + 2 * n_out * br) * w128 * 4
        if vmem * mult <= budget * 1024 * 1024:
            return br
    return None


_EMIT_VMEM_LIMIT = 48 * 1024 * 1024  # scoped-stack limit for emit_residual


def _kernel(coeffs_ref, scal_ref, exg_h, eyg_h, rx_h, ry_h, es_h, en_h,
            *out_and_scratch,
            br, grid, iters, zero_init, h=H, emit_residual=False,
            periodic_x=False):
    """Window row maps for halo depth h, top = h + 1 (padded row p =
    window row w + i*br):
      exg: vx row j  at w = j + top  (ghost top row at w = h for block 0)
      eyg: vy row j  at w = j + top
      rx : vx row j  at w = j + top    es: corner row J at w = J + top
      ry : vy row j  at w = j + top    en: center row j at w = j + top
    (all relative to the block's first vx row r0v = i*br).

    ``emit_residual``: additionally output (rx - A ex, ry - A ey) of the
    FINAL iterate — one extra in-VMEM stencil application, saving the
    V-cycle's separate momentum_apply HBM pass.  Needs h >= iters + 1
    (staleness advances one row per application; the residual is one more)."""
    if emit_residual:
        (ex_out, ey_out, rfx_out, rfy_out,
         exg_b2, eyg_b2, rx_b2, ry_b2, es_b2, en_b2, sems) = out_and_scratch
    else:
        (ex_out, ey_out,
         exg_b2, eyg_b2, rx_b2, ry_b2, es_b2, en_b2, sems) = out_and_scratch
    ny, nx = grid.ny, grid.nx
    dx, dy = grid.dx, grid.dy
    top = h + 1
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    W = br + 2 * h + 2

    idx = [jnp.int32(v) for v in range(6)]

    def dmas(slot, blk):
        row = blk * jnp.int32(br)
        bufs = (exg_b2, eyg_b2, rx_b2, ry_b2, es_b2, en_b2)
        hbms = (exg_h, eyg_h, rx_h, ry_h, es_h, en_h)
        return [
            pltpu.make_async_copy(h.at[pl.ds(row, W)], b.at[slot],
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

    kb = scal_ref[0]
    s_top, s_bottom, s_left, s_right = (scal_ref[1], scal_ref[2],
                                        scal_ref[3], scal_ref[4])

    ex = exg_b2[slot, :, : nx + 1]  # (W, nx+1) vx rows i*br-4 .. i*br+br+3
    ey = eyg_b2[slot, :, : nx + 2]  # (W, nx+2) vy rows, ghost cols 0 & nx+1
    rx = rx_b2[slot, :, : nx + 1]
    ry = ry_b2[slot, :, : nx + 2]   # ghost-col layout matching ey (cols 1..nx)
    es = es_b2[slot, :, : nx + 1]   # corner rows
    en = en_b2[slot, :, : nx + 2]   # center rows in cols 1..nx (see prep)

    en_c = en[:, 1 : nx + 1]  # (W, nx) center columns

    # --- Jacobi diagonals from the window viscosities (velocity_diagonals)
    # dvx at vx row j (w) cols 1..nx-1: 2(en[j,i]+en[j,i-1])/dx^2
    #   + (es[j,1:-1... es rows J=j and J=j+1)/dy^2; Dirichlet cols = kbnd.
    es_dn = jnp.concatenate([es[1:], es[-1:]], axis=0)  # corner row J = j+1
    dvx_int = (
        2.0 * (en_c[:, 1:] + en_c[:, :-1]) / dx**2
        + (es[:, 1:-1] + es_dn[:, 1:-1]) / dy**2
    )  # rows w: uses es rows w (J=j) and w+1 (J=j+1); last row garbage (edge)
    if periodic_x:
        # seam diagonal under the half-row convention
        # (stokes_solver.velocity_diagonals)
        dvx_seam = 0.5 * (
            2.0 * (en_c[:, :1] + en_c[:, -1:]) / dx**2
            + (es[:, :1] + es_dn[:, :1]) / dy**2
        )
        dvx = jnp.concatenate([dvx_seam, dvx_int, dvx_seam], axis=1)
    else:
        dvx = jnp.concatenate(
            [jnp.full_like(dvx_int[:, :1], kb), dvx_int,
             jnp.full_like(dvx_int[:, :1], kb)], axis=1,
        )  # (W, nx+1)
    # dvy at vy row j cols 0..nx-1 (en cols): 2(en[j]+en[j-1])/dy^2
    #   + (es[j, i+1]+es[j, i])/dx^2 ; wall rows j in {0, ny} = kbnd.
    en_up = jnp.concatenate([en_c[:1], en_c[:-1]], axis=0)  # center row j-1
    dvy_int = (
        2.0 * (en_c + en_up) / dy**2 + (es[:, 1:] + es[:, :-1]) / dx**2
    )  # (W, nx); rows w: en rows w (cell j) and w-1 (cell j-1); first row garbage
    gvy = (i * jnp.int32(br) - jnp.int32(top)) + lax.broadcasted_iota(
        jnp.int32, (W, nx), 0
    )  # global vy row of each window row
    wall_vy = jnp.logical_or(gvy == 0, gvy == ny)
    dvy = jnp.where(wall_vy, kb, dvy_int)

    coeffs = [(coeffs_ref[k, 0], coeffs_ref[k, 1]) for k in range(iters)]

    first_block = i == 0
    last_block = i == nb - one
    rw_iota = lax.broadcasted_iota(jnp.int32, (W, nx + 1), 0)
    cw_iota_y = lax.broadcasted_iota(jnp.int32, (W, nx + 2), 1)
    # ghost-bottom window row for the last block: vxg row ny+1 -> w = br+top
    gb = jnp.int32(br + top)

    dxs = jnp.zeros_like(ex)
    dys = jnp.zeros_like(ey[:, 1 : nx + 1])

    def bc_fix(ex, ey):
        # vx ghost rows (first/last block only): re-deriving the ghost
        # from the CURRENT first/last interior row every iteration keeps
        # wall physics exact (no staleness at domain boundaries)
        ex = jnp.where(
            jnp.logical_and(first_block, rw_iota == h),
            s_top * ex[top : top + 1],
            ex,
        )
        ex = jnp.where(
            jnp.logical_and(last_block, rw_iota == gb),
            s_bottom * ex[br + top - 1 : br + top],
            ex,
        )
        # vy ghost columns (every block, every iteration); periodic sides
        # wrap through the seam instead of mirroring with a ghost sign
        if periodic_x:
            ey = jnp.where(cw_iota_y == 0, ey[:, nx : nx + 1], ey)
            ey = jnp.where(cw_iota_y == nx + 1, ey[:, 1:2], ey)
        else:
            ey = jnp.where(cw_iota_y == 0, s_left * ey[:, 1:2], ey)
            ey = jnp.where(cw_iota_y == nx + 1, s_right * ey[:, nx : nx + 1], ey)
        return ex, ey

    def apply_A(ex, ey):
        """Coupled momentum stencil over the whole window.
        Window row w holds: vx/cell/vy/corner row (w - top) relative to
        the block's first vx row.  sxy at corner row J (w = J+top) uses
        vx rows J-1 (w-1) and J (w) and vy row J (w); edge rows come
        out garbage and are sacrificial (deep-halo argument above)."""
        sxy = es * (
            (ex - jnp.concatenate([ex[:1], ex[:-1]], axis=0)) / dy
            + (ey[:, 1:] - ey[:, :-1]) / dx
        )  # (W, nx+1): row w = corner row J = w - top + r0v; row 0 garbage
        sxx = 2.0 * en_c * (ex[:, 1:] - ex[:, :-1]) / dx  # (W, nx) cell row at w
        ey_c = ey[:, 1 : nx + 1]
        syy = 2.0 * en_c * (
            jnp.concatenate([ey_c[1:], ey_c[-1:]], axis=0) - ey_c
        ) / dy  # (W, nx): cell row j at w uses vy rows j (w), j+1 (w+1)

        # ax at vx row j (w): -(sxx[j,i]-sxx[j,i-1])/dx - (sxy[J=j+1]-sxy[J=j])/dy
        sxy_dn = jnp.concatenate([sxy[1:], sxy[-1:]], axis=0)  # corner J=j+1
        ax_int = (
            -(sxx[:, 1:] - sxx[:, :-1]) / dx
            - (sxy_dn[:, 1:-1] - sxy[:, 1:-1]) / dy
        )  # (W, nx-1)
        if periodic_x:
            # wrapped half-convention seam column (ops/stokes.py); both
            # duplicate vx columns receive the identical half-equation, so
            # the update preserves seam consistency
            ax_seam = 0.5 * (
                -(sxx[:, :1] - sxx[:, -1:]) / dx
                - (sxy_dn[:, :1] - sxy[:, :1]) / dy
            )
            ax = jnp.concatenate([ax_seam, ax_int, ax_seam], axis=1)
        else:
            ax = jnp.concatenate(
                [kb * ex[:, :1], ax_int, kb * ex[:, -1:]], axis=1
            )
        # ay at vy row j (w): -(syy[j]-syy[j-1])/dy - (sxy[J=j,i+1]-sxy[J=j,i])/dx
        syy_up = jnp.concatenate([syy[:1], syy[:-1]], axis=0)  # cell j-1
        ay_int = (
            -(syy - syy_up) / dy - (sxy[:, 1:] - sxy[:, :-1]) / dx
        )  # (W, nx)
        ay = jnp.where(wall_vy, kb * ey_c, ay_int)
        return ax, ay

    for k in range(iters):
        c1, c2 = coeffs[k]
        ex, ey = bc_fix(ex, ey)
        if not (zero_init and k == 0):
            ax, ay = apply_A(ex, ey)
            dxs = c1 * dxs + c2 * (rx - ax) / dvx
            dys = c1 * dys + c2 * (ry[:, 1 : nx + 1] - ay) / dvy
        else:
            dxs = c2 * rx / dvx
            dys = c2 * ry[:, 1 : nx + 1] / dvy

        ex = ex + dxs
        ey = jnp.concatenate(
            [ey[:, :1], ey[:, 1 : nx + 1] + dys, ey[:, nx + 1 :]], axis=1
        )

    if emit_residual:
        # one more in-VMEM application on the final iterate (central rows
        # still fresh: h >= iters + 1 asserted by the dispatcher)
        ex, ey = bc_fix(ex, ey)
        ax, ay = apply_A(ex, ey)
        rfx_out[:, :] = (rx - ax)[top : top + br, :]
        rfy_out[:, :] = (ry[:, 1 : nx + 1] - ay)[top : top + br, :]

    ex_out[:, :] = ex[top : top + br, :]
    ey_out[:, :] = ey[top : top + br, 1 : nx + 1]


def _pad_top_rows(a, top, rows, w128):
    return jnp.pad(a, ((top, rows - top - a.shape[0]), (0, w128 - a.shape[1])))


def prep_smoother_eta(eta_s, eta_n, grid: StaggeredGrid, block_rows=64,
                      h: int = H, n_out: int = 2):
    """Host-side padding of the viscosity streams — frozen for a whole
    solve, so multigrid levels hoist this out of the ~100s of sweeps.
    ``h``: halo depth the sweeps will use (window = br + 2h + 2 rows);
    ``n_out``: output-block count the VMEM budget must hold (4 with
    emit_residual)."""
    ny, nx = grid.ny, grid.nx
    top = h + 1
    f32 = jnp.float32
    br = min(_pick_block_rows(ny, nx, h, n_out=n_out) or block_rows,
             block_rows, ny)
    assert ny % br == 0, (ny, br)
    # last window reads padded rows [ny - br, ny + 2h + 2); 8-align
    rows = ny + -(-(top + 2 * h + 2) // 8) * 8
    w128 = -(-(nx + 2) // 128) * 128
    es = _pad_top_rows(eta_s.astype(f32), top, rows, w128)
    # en in ghost-col layout (cols 1..nx), so column algebra lines up with ey
    en = _pad_top_rows(jnp.pad(eta_n.astype(f32), ((0, 0), (1, 1))), top, rows,
                       w128)
    return es, en, br, rows, w128, h


def chebyshev_coeffs(lam_max, iters, dtype=jnp.float32):
    """(c1_k, c2_k) of the standard Chebyshev recurrence on
    [lam_max/4, lam_max] (matching solvers/mg.py smooth())."""
    lmax = lam_max
    lmin = lmax / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rows = [(jnp.zeros_like(theta), 1.0 / theta)]
    ro = 1.0 / sigma1
    for _ in range(iters - 1):
        rho = 1.0 / (2.0 * sigma1 - ro)
        rows.append((rho * ro, 2.0 * rho / delta))
        ro = rho
    return jnp.stack([jnp.stack([a.astype(dtype), jnp.asarray(b, dtype)])
                      for a, b in rows])


def chebyshev_smooth_pallas(
    ex, ey, rx, ry, eta_s, eta_n, grid: StaggeredGrid, bcs: VelocityBCs,
    kbnd, lam_max, iters: int, zero_init: bool = False,
    block_rows: int = 64, interpret: bool = False, prepped=None,
    emit_residual: bool = False,
):
    """Fused `iters`-iteration Chebyshev sweep; returns (ex', ey'), or
    (ex', ey', rfx, rfy) with ``emit_residual`` where (rfx, rfy) =
    (rx - A ex', ry - A ey') — the V-cycle's restriction input computed by
    one extra stencil application on the VMEM-resident window instead of a
    separate momentum_apply HBM pass (requires halo depth h >= iters + 1).

    ``zero_init``: (ex, ey) are known-zero (the V-cycle's pre-smooth) —
    skips the first operator application entirely.
    ``prepped``: optional output of prep_smoother_eta (the viscosity pads
    are per-solve constants; rx/ry change per sweep and are padded here)."""
    ny, nx = grid.ny, grid.nx
    f32 = jnp.float32
    ex = ex.astype(f32)
    ey = ey.astype(f32)

    if prepped is None:
        prepped = prep_smoother_eta(
            eta_s, eta_n, grid, block_rows,
            h=_pick_h(iters + (1 if emit_residual else 0)) or HS[-1],
        )
    es, en, br, rows, w128, h = prepped
    assert 1 <= iters + (1 if emit_residual else 0) <= h, (iters, h)
    top = h + 1
    rxp = _pad_top_rows(rx.astype(f32), top, rows, w128)
    ryp = _pad_top_rows(jnp.pad(ry.astype(f32), ((0, 0), (1, 1))), top, rows,
                        w128)

    # ex with ghost rows at vxg layout, then top-1 more zero rows above the
    # ghost: padded row p = vx row p - top
    exg = jnp.concatenate([bcs.s_top * ex[:1], ex, bcs.s_bottom * ex[-1:]], axis=0)
    exg = _pad_top_rows(exg, top - 1, rows, w128)
    if bcs.periodic_x:
        eyg = jnp.concatenate([ey[:, -1:], ey, ey[:, :1]], axis=1)
        s_lr = (0.0, 0.0)  # unused in the wrap path (no ghost sign exists)
    else:
        eyg = jnp.concatenate(
            [bcs.s_left * ey[:, :1], ey, bcs.s_right * ey[:, -1:]], axis=1
        )
        s_lr = (bcs.s_left, bcs.s_right)
    eyg = _pad_top_rows(eyg, top, rows, w128)

    coeffs = chebyshev_coeffs(lam_max, iters)
    scal = jnp.asarray(
        [kbnd, bcs.s_top, bcs.s_bottom, s_lr[0], s_lr[1]], f32
    )

    nb = ny // br
    vx_spec = pl.BlockSpec((br, nx + 1), lambda i, *_: (i, i * 0),
                           memory_space=pltpu.VMEM)
    vy_spec = pl.BlockSpec((br, nx), lambda i, *_: (i, i * 0),
                           memory_space=pltpu.VMEM)
    out_specs = [vx_spec, vy_spec] + ([vx_spec, vy_spec] if emit_residual else [])
    out_shape = [
        jax.ShapeDtypeStruct((nb * br, nx + 1), f32),
        jax.ShapeDtypeStruct((nb * br, nx), f32),
    ] * (2 if emit_residual else 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, br + 2 * h + 2, w128), f32) for _ in range(6)
        ] + [pltpu.SemaphoreType.DMA((2, 6))],
    )

    kernel = functools.partial(
        _kernel, br=br, grid=grid, iters=iters, zero_init=zero_init, h=h,
        emit_residual=emit_residual, periodic_x=bcs.periodic_x,
    )

    compiler_params = None
    # Large-grid blocks exceed the default 16 MB scoped guardrail
    # (measured: 16.52 MB plain / ~21+ MB with emit_residual's extra
    # in-VMEM application at 2048^2, while every 1024^2 variant fits the
    # default); raise the limit rather than shrink the blocks — v5e has
    # 128 MB VMEM.  Conditional on nx: an unconditional raise was
    # implicated in tpu_compile_helper crashes on full-step graphs that
    # don't need it (1024^2).
    if not interpret and nx >= 2048:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=_EMIT_VMEM_LIMIT
        )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=compiler_params,
    )(coeffs, scal, exg, eyg, rxp, ryp, es, en)
    ex_new = outs[0][:ny]
    ey_main = outs[1][:ny]

    # vy wall row ny (Dirichlet): pointwise Chebyshev recurrence, one row
    kb = jnp.asarray(kbnd, f32)
    ey_last = ey[-1:, :]
    ry_last = ry.astype(f32)[-1:, :]
    dy_last = jnp.zeros_like(ey_last)
    for k in range(iters):
        c1 = coeffs[k, 0]
        c2 = coeffs[k, 1]
        if zero_init and k == 0:
            dy_last = c2 * ry_last / kb
        else:
            dy_last = c1 * dy_last + c2 * (ry_last - kb * ey_last) / kb
        ey_last = ey_last + dy_last
    ey_new = jnp.concatenate([ey_main, ey_last], axis=0)
    if not emit_residual:
        return ex_new, ey_new
    rfx = outs[2][:ny]
    rfy_main = outs[3][:ny]
    rfy_last = ry_last - kb * ey_last
    rfy = jnp.concatenate([rfy_main, rfy_last], axis=0)
    return ex_new, ey_new, rfx, rfy


def smoother_eligible(grid: StaggeredGrid, dtype, iters: int,
                      block_rows: int = 64,
                      emit_residual: bool = False) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    if not grid.uniform:
        return False
    ny, nx = grid.ny, grid.nx
    depth = iters + (1 if emit_residual else 0)
    h = _pick_h(depth)
    if h is None or iters < 1:
        return False
    return (
        dtype == jnp.float32
        and _pick_block_rows(ny, nx, h, n_out=4 if emit_residual else 2)
        is not None
        and nx >= 256
        and platform not in ("cpu", "gpu")
    )
