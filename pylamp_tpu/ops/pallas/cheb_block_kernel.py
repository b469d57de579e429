"""Pallas TPU kernel: fused multi-iteration Chebyshev smoother on a
halo-extended PER-SHARD frame.

Round-4 verdict item 1 (second half): the fused smoother
(ops/pallas/cheb_kernel.py) was force-disabled on any mesh, so the
dominant Stokes phase lost its kernel wins on the v5e-8 target.  Each
explicit-halo ``shard_map`` body is a single-device program, so the fused
sweep can run per shard on a deep-halo frame:

- the shard body (parallel/halo_smoother.py) exchanges depth-``h`` halos
  ONCE per sweep call (one ppermute strip per side, not one per
  iteration) and hands this kernel a virtual mini-grid of
  R = by + 2h rows x C = bx + 2h cells containing the shard's interior
  plus h rings of neighbor data;
- the kernel runs ALL ``iters <= h`` coupled Chebyshev iterations
  VMEM-resident on the frame.  Frame-edge values go stale by one ring per
  iteration (the same deep-halo/temporal-blocking argument as the
  single-device kernel's row blocks); the central by x bx block stays
  exact because h >= iters (h >= iters + 1 with ``emit_residual``);
- PHYSICAL walls never go stale: the wall ghost ring is re-derived from
  the current first/last interior row/column before every iteration
  (ghost = s * interior), gated by RUNTIME wall flags — inside shard_map
  the shard's mesh position is a traced value, so wall handling cannot be
  specialized at trace time and is applied as masked selects instead;
- Dirichlet lattice lines inside the frame (global vx columns 0/nx,
  global vy rows 0/ny) evolve EXACTLY in-kernel: their diagonal is kbnd
  and their operator row is kbnd * value, so the recurrence reduces to
  the same pointwise update the wrapper applies to the seam strips
  outside — interior stencils near a seam therefore read fresh values on
  every iteration.

Frame index conventions (h = halo depth; r0/c0 = the shard's first global
interior row/col):

    ex  (R,   C+1): frame row f = global vx row r0-h+f, col g = vx col c0-h+g
    ey  (R+1, C  ): frame row f = global vy row r0-h+f
    rx/ry: same frames as ex/ey
    es  (R+1, C+1): corner row/col r0-h+f / c0-h+g
    en  (R,   C  ): cell row/col

Single-block kernel: the whole frame is VMEM-resident (per-shard blocks on
the production meshes are <= ~512 x 512; the eligibility model falls back
to the jnp path when the frame would not fit).  f32 only.

Equivalence vs the jnp smoother is asserted by
tests/test_halo_smoother_pallas.py (interpret mode on the CPU mesh, to fp
tolerance — the recurrence is reassociated, not reordered).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def frame_cheb_sweep(ex, ey, rx, ry, es, en, *, by, bx, h, dx, dy, kb,
                     s_signs, wall_flags, coeffs, iters, zero_init,
                     emit_residual, coeff_fn=None):
    """The frame smoother core as a pure function on VMEM values —
    callable from this module's pallas kernel AND from the fused
    coarse-V-cycle kernel (ops/pallas/coarse_vcycle_kernel.py), where
    every level is a frame with h = 1 and all-wall flags.

    Inputs are FULL frames (module docstring layout); returns full-frame
    (ex, ey) or (ex, ey, rfx, rfy) — callers slice the central block.
    ``wall_flags``/``coeffs`` entries may be traced scalars (shard_map) or
    Python constants (the coarse kernel)."""
    R = by + 2 * h
    C = bx + 2 * h
    s_top, s_bottom, s_left, s_right = s_signs
    wt, wb, wl, wr = wall_flags

    is_wt = wt > 0.5
    is_wb = wb > 0.5
    is_wl = wl > 0.5
    is_wr = wr > 0.5

    rows_x = lax.broadcasted_iota(jnp.int32, (R, C + 1), 0)
    cols_x = lax.broadcasted_iota(jnp.int32, (R, C + 1), 1)
    rows_y = lax.broadcasted_iota(jnp.int32, (R + 1, C), 0)
    cols_y = lax.broadcasted_iota(jnp.int32, (R + 1, C), 1)

    # Dirichlet masks: global vx col 0 sits at frame col h on wall-left
    # shards, col nx at frame col h+bx on wall-right; vy rows likewise.
    m_dx = (is_wl & (cols_x == h)) | (is_wr & (cols_x == h + bx))
    m_dy = (is_wt & (rows_y == h)) | (is_wb & (rows_y == h + by))

    def shift_dn(a):  # row f -> row f-1 content (edge-replicated junk)
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    def shift_up(a):  # row f -> row f+1 content
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    def shift_r(a):  # col g -> col g-1 content
        return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

    def shift_l(a):  # col g -> col g+1 content
        return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    # -- Jacobi diagonals (velocity_diagonals, frame-wide) -------------------
    enc = jnp.concatenate([en, en[:, -1:]], axis=1)   # (R, C+1) col g = cell g
    enp = jnp.concatenate([en[:, :1], en], axis=1)    # col g = cell g-1
    dvx = 2.0 * (enc + enp) / dx**2 + (es[:-1, :] + es[1:, :]) / dy**2
    dvx = jnp.where(m_dx, kb, dvx)
    enc2 = jnp.concatenate([en, en[-1:, :]], axis=0)  # (R+1, C) row f = cell f
    enp2 = jnp.concatenate([en[:1, :], en], axis=0)   # row f = cell f-1
    dvy = 2.0 * (enc2 + enp2) / dy**2 + (es[:, 1:] + es[:, :-1]) / dx**2
    dvy = jnp.where(m_dy, kb, dvy)

    def bc_fix(ex, ey):
        # wall ghost rings re-derived from CURRENT interior values so wall
        # physics is exact on every iteration (runtime-flag gated)
        ex = jnp.where(is_wt & (rows_x == h - 1),
                       s_top * ex[h : h + 1, :], ex)
        ex = jnp.where(is_wb & (rows_x == h + by),
                       s_bottom * ex[h + by - 1 : h + by, :], ex)
        ey = jnp.where(is_wl & (cols_y == h - 1),
                       s_left * ey[:, h : h + 1], ey)
        ey = jnp.where(is_wr & (cols_y == h + bx),
                       s_right * ey[:, h + bx - 1 : h + bx], ey)
        return ex, ey

    def apply_A(ex, ey):
        """Coupled momentum stencil over the whole frame; frame-edge rows
        and columns come out garbage and are sacrificial."""
        # sxy at corner (f, g): vx rows f-1/f, vy row f cols g-1/g
        ex_J = jnp.concatenate([ex, ex[-1:, :]], axis=0)    # (R+1, C+1)
        ex_Jm1 = jnp.concatenate([ex[:1, :], ex], axis=0)
        ey_I = jnp.concatenate([ey, ey[:, -1:]], axis=1)    # (R+1, C+1)
        ey_Im1 = jnp.concatenate([ey[:, :1], ey], axis=1)
        sxy = es * ((ex_J - ex_Jm1) / dy + (ey_I - ey_Im1) / dx)

        sxx = 2.0 * en * (ex[:, 1:] - ex[:, :-1]) / dx       # (R, C)
        syy = 2.0 * en * (ey[1:, :] - ey[:-1, :]) / dy       # (R, C)

        # ax at vx (f, g): -(sxx[f,g] - sxx[f,g-1])/dx - (sxy[f+1,g]-sxy[f,g])/dy
        sxxc = jnp.concatenate([sxx, sxx[:, -1:]], axis=1)   # (R, C+1)
        sxxp = jnp.concatenate([sxx[:, :1], sxx], axis=1)
        ax = -(sxxc - sxxp) / dx - (sxy[1:, :] - sxy[:-1, :]) / dy
        ax = jnp.where(m_dx, kb * ex, ax)

        # ay at vy (f, g): -(syy[f]-syy[f-1])/dy - (sxy[f,g+1]-sxy[f,g])/dx
        syyc = jnp.concatenate([syy, syy[-1:, :]], axis=0)   # (R+1, C)
        syyp = jnp.concatenate([syy[:1, :], syy], axis=0)
        ay = -(syyc - syyp) / dy - (sxy[:, 1:] - sxy[:, :-1]) / dx
        ay = jnp.where(m_dy, kb * ey, ay)
        return ax, ay

    if coeffs is None:
        # fori mode (the fused coarse-V-cycle kernel): one traced loop
        # body instead of ``iters`` unrolled sweeps — the coarse kernel
        # runs up to 32 coarsest-level iterations per level and the
        # unrolled form blew Mosaic's compile time up unboundedly.
        # ``coeff_fn(k) -> (c1_k, c2_k)`` reads SMEM scalars at a traced
        # index.  With zero_init the k = 0 body is the SAME arithmetic
        # because A(0) evaluates exactly 0 (every term multiplies a
        # zero) and c1_0 = 0.
        dxs = jnp.zeros_like(ex)
        dys = jnp.zeros_like(ey)

        def body(k, st):
            ex, ey, dxs, dys = st
            c1, c2 = coeff_fn(k)
            ex, ey = bc_fix(ex, ey)
            ax, ay = apply_A(ex, ey)
            dxs = c1 * dxs + c2 * (rx - ax) / dvx
            dys = c1 * dys + c2 * (ry - ay) / dvy
            return ex + dxs, ey + dys, dxs, dys

        # i32 bounds: under x64 a Python-int bound makes the loop index
        # i64, and mixing it into SMEM index arithmetic fails Mosaic
        # verification ('arith.muli' requires same type).
        ex, ey, _, _ = lax.fori_loop(jnp.int32(0), jnp.int32(iters), body,
                                     (ex, ey, dxs, dys))
    else:
        dxs = jnp.zeros_like(ex)
        dys = jnp.zeros_like(ey)

        for k in range(iters):
            c1, c2 = coeffs[k]
            ex, ey = bc_fix(ex, ey)
            if zero_init and k == 0:
                dxs = c2 * rx / dvx
                dys = c2 * ry / dvy
            else:
                ax, ay = apply_A(ex, ey)
                dxs = c1 * dxs + c2 * (rx - ax) / dvx
                dys = c1 * dys + c2 * (ry - ay) / dvy
            ex = ex + dxs
            ey = ey + dys

    if emit_residual:
        ex_f, ey_f = bc_fix(ex, ey)
        ax, ay = apply_A(ex_f, ey_f)
        return ex, ey, rx - ax, ry - ay
    return ex, ey


def _kernel(coeffs_ref, scal_ref, ex_ref, ey_ref, rx_ref, ry_ref, es_ref,
            en_ref, *outs, by, bx, h, dx, dy, iters, zero_init,
            emit_residual):
    if emit_residual:
        ex_out, ey_out, rfx_out, rfy_out = outs
    else:
        ex_out, ey_out = outs
    R = by + 2 * h
    C = bx + 2 * h

    kb = scal_ref[0]
    s_signs = (scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4])
    wall_flags = (scal_ref[5], scal_ref[6], scal_ref[7], scal_ref[8])

    out = frame_cheb_sweep(
        ex_ref[:R, : C + 1], ey_ref[: R + 1, :C],
        rx_ref[:R, : C + 1], ry_ref[: R + 1, :C],
        es_ref[: R + 1, : C + 1], en_ref[:R, :C],
        by=by, bx=bx, h=h, dx=dx, dy=dy, kb=kb, s_signs=s_signs,
        wall_flags=wall_flags,
        coeffs=[(coeffs_ref[k, 0], coeffs_ref[k, 1]) for k in range(iters)],
        iters=iters, zero_init=zero_init, emit_residual=emit_residual,
    )
    if emit_residual:
        ex, ey, rfx, rfy = out
        rfx_out[:, :] = rfx[h : h + by, h : h + bx]
        rfy_out[:, :] = rfy[h : h + by, h : h + bx]
    else:
        ex, ey = out
    ex_out[:, :] = ex[h : h + by, h : h + bx]
    ey_out[:, :] = ey[h : h + by, h : h + bx]


def block_smoother_vmem_bytes(by: int, bx: int, h: int,
                              emit_residual: bool) -> int:
    """Calibratable whole-frame VMEM model: 6 input frames + 2-4 output
    blocks + ~12 frame-sized temporaries (stress fields, diagonals,
    recurrence state, shifted copies Mosaic cannot alias)."""
    R = by + 2 * h
    W = -(-(bx + 2 * h + 2) // 128) * 128
    rows = -(-(R + 1) // 8) * 8
    n_out = 4 if emit_residual else 2
    frames = 6 + 12
    return (frames * rows + n_out * by) * W * 4


_VMEM_BUDGET = 96 * 1024 * 1024  # v5e has 128 MB; leave headroom


def block_smoother_eligible(by: int, bx: int, dtype, iters: int,
                            emit_residual: bool = False,
                            interpret: bool = False) -> bool:
    if dtype != jnp.float32 or iters < 1:
        return False
    h = iters + (1 if emit_residual else 0)
    if by < 8 or bx < 8:
        return False
    if block_smoother_vmem_bytes(by, bx, h, emit_residual) > _VMEM_BUDGET:
        return False
    if interpret:
        return True
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return platform not in ("cpu", "gpu") and bx >= 64 and by >= 64


def chebyshev_coeffs_block(lam_max, iters):
    from pylamp_tpu.ops.pallas.cheb_kernel import chebyshev_coeffs

    return chebyshev_coeffs(lam_max, iters)


def cheb_block_pallas(ex_v, ey_v, rx_v, ry_v, es_v, en_v, *, by, bx, h,
                      grid, kbnd, s_signs, wall_flags, lam_max, iters,
                      zero_init=False, emit_residual=False,
                      interpret=False):
    """Run the fused sweep on pre-built frames.  ``wall_flags``: traced
    (wt, wb, wl, wr) 0/1 scalars (mesh position is data inside shard_map).
    Returns (ex, ey) central blocks, or (ex, ey, rfx, rfy)."""
    f32 = jnp.float32
    R = by + 2 * h
    C = bx + 2 * h
    W = -(-(C + 2) // 128) * 128
    rows = -(-(R + 1) // 8) * 8

    def pad(a):
        return jnp.pad(a.astype(f32),
                       ((0, rows - a.shape[0]), (0, W - a.shape[1])))

    coeffs = chebyshev_coeffs_block(lam_max, iters)
    s_top, s_bottom, s_left, s_right = s_signs
    wt, wb, wl, wr = wall_flags
    scal = jnp.stack([
        jnp.asarray(kbnd, f32), jnp.asarray(s_top, f32),
        jnp.asarray(s_bottom, f32), jnp.asarray(s_left, f32),
        jnp.asarray(s_right, f32),
        wt.astype(f32), wb.astype(f32), wl.astype(f32), wr.astype(f32),
    ])

    # explicit whole-array specs with i32 index maps: the auto-generated
    # constant index map returns i64 under jax_enable_x64, which Mosaic
    # fails to legalize (caught on the real chip — interpret mode hides it)
    def full(shape):
        return pl.BlockSpec(shape, lambda i, *_: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    n_out = 4 if emit_residual else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[full((rows, W))] * 6,
        out_specs=[full((by, bx))] * n_out,
    )
    kernel = functools.partial(
        _kernel, by=by, bx=bx, h=h, dx=grid.dx, dy=grid.dy, iters=iters,
        zero_init=zero_init, emit_residual=emit_residual,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((by, bx), f32)] * n_out,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024
        ),
    )(coeffs, scal, pad(ex_v), pad(ey_v), pad(rx_v), pad(ry_v), pad(es_v),
      pad(en_v))
    return tuple(outs)
