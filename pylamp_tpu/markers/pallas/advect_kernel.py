"""Pallas TPU kernel: fused RK4 marker advection.

The XLA bucketed RK4 (markers/bucket.py `bucket_advect_rk4`) performs 8
dense-shift bilinear samples (4 stages x 2 velocity lattices), each one a
(2r+2)^2-neighbor masked pass over the (ny, nx, K) position arrays —
~40 ms at 1024^2 x K18 on v5e.  All of it re-reads the marker positions
from HBM per stage.

This kernel runs the whole RK4 integration in one VMEM residency:

- marker streams use the same slot-major (K, rows, nx) layout as the
  rebucket/m2g kernels; the grid runs over cell-row blocks, outputs are
  the block's own rows — no output halo;
- the ghost-padded velocity fields (tiny 2-D arrays) are DMA'd per block
  with a `reach`-deep halo and pre-sliced into the (2r+2) column-offset
  planes ONCE per block — sampling then needs no lane shifts at all:
  marker at lane ci reading array column ci+b uses plane b at its own
  lane;
- per slot, the 4 RK stages chain entirely in registers/VMEM; each
  bilinear sample is sum_{a,b} ry_a * cx_b * V_b[rows+a] with separable
  branch-free offset masks (same algebra as the XLA path, different f32
  summation order -> ~1e-6 relative agreement, tests/test_advect_kernel.py).

Positions are finally clipped to the closed domain exactly like the XLA
path.  Preconditions: in-cell positions (post-rebucket state) and stage
displacements bounded by ``stage_reach`` cells (the step driver already
guarantees both; models/step.py picks reach from the Courant bound).
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

PAD_TOP = 1  # marker streams reuse the rebucket/m2g padded layout
PAD_BOT = 15


def _kernel(dt_h, xs_h, ys_h, vs_h, vxp_h, vyp_h, ox, oy,
            dt_v, xs, ys, vs, vxw, vyw, sems, *, br, K, ny, nx, dx, dy, reach,
            vx_rows, vy_rows, lx, ly, periodic_x=False, nxl=None,
            with_bases=False):
    """``nxl``: local lane count (nx for the single-device dispatch; the
    block width bx for the per-shard dispatch inside the explicit-halo
    shard_map engine).  ``with_bases``: the dt scratch additionally carries
    the traced (row_base, col_base) of the block's first own cell at
    [0, 1] / [0, 2] — per-shard mode, where the velocity windows are the
    exchanged vx_ext/vy_ext blocks of parallel/halo_markers (their frames
    coincide with the global padded layout shifted by the bases)."""
    f32 = jnp.float32
    i32 = jnp.int32
    r = reach
    nxl = nx if nxl is None else nxl
    i = pl.program_id(0)
    row0 = i * jnp.int32(br)

    # marker streams: 8-row-aligned window starting at padded row row0
    # (Mosaic requires tile-aligned DMA starts; own rows sit at local
    # offset PAD_TOP)
    copies = [
        pltpu.make_async_copy(h.at[:, pl.ds(row0, br + 8), :], b,
                              sems.at[jnp.int32(n)])
        for n, (h, b) in enumerate([(xs_h, xs), (ys_h, ys), (vs_h, vs)])
    ]
    # velocity windows: padded arrays have `r` extra rows on top, so padded
    # row row0 holds array row row0 - r; DMA br + 2r + 2 rows (<= br + 8)
    copies.append(pltpu.make_async_copy(
        vxp_h.at[pl.ds(row0, br + 8), :], vxw, sems.at[jnp.int32(3)]))
    copies.append(pltpu.make_async_copy(
        vyp_h.at[pl.ds(row0, br + 8), :], vyw, sems.at[jnp.int32(4)]))
    # the traced dt scalar travels as a tiny ANY-space array: a blocked
    # (VMEM/SMEM) input mixed with manual-DMA ANY inputs fails Mosaic
    # lowering ('failed to legalize func.return', bisected on v5e)
    copies.append(pltpu.make_async_copy(dt_h, dt_v, sems.at[jnp.int32(5)]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    dt = dt_v[0, 0]
    inv_dx = f32(1.0 / dx)
    inv_dy = f32(1.0 / dy)

    # column-offset planes: marker at lane ci sampling array col ci + b
    # reads plane Vb at its own lane (host layout has a `r`-lane left pad)
    bs = list(range(-r, r + 2))
    Vxb = {b: vxw[:, r + b : r + b + nxl] for b in bs}
    Vyb = {b: vyw[:, r + b : r + b + nxl] for b in bs}

    colf = lax.broadcasted_iota(i32, (br, nxl), 1).astype(f32)
    rowf = (row0 + lax.broadcasted_iota(i32, (br, nxl), 0)).astype(f32)
    if with_bases:
        rowf = rowf + dt_v[0, 1]
        colf = colf + dt_v[0, 2]

    def _do_sample(Vb, rows_n, cols_n, fx, fy, vl):
        """Bilinear sample of a velocity lattice in its array coords: the
        marker in cell (cj, ci) only ever reads array rows cj + bs and
        cols ci + bs (precondition: displacement bounded by `reach`).
        Periodic sides: no x clamp — out-of-range i0 reads the host-built
        wrapped column planes (same convention as the XLA _sample_padded)."""
        if periodic_x:
            i0 = jnp.floor(fx)
        else:
            i0 = jnp.clip(jnp.floor(fx), f32(0.0), f32(cols_n - 2))
        j0 = jnp.clip(jnp.floor(fy), f32(0.0), f32(rows_n - 2))
        tx = jnp.clip(fx - i0, f32(0.0), f32(1.0))
        ty = jnp.clip(fy - j0, f32(0.0), f32(1.0))
        wx0, wx1 = f32(1.0) - tx, tx
        wy0, wy1 = f32(1.0) - ty, ty
        out = jnp.zeros((br, nxl), f32)
        for a in bs:
            ry = wy0 * (j0 == rowf + f32(a)) + wy1 * (j0 == rowf + f32(a - 1))
            acc_b = jnp.zeros((br, nxl), f32)
            for b in bs:
                cx = wx0 * (i0 == colf + f32(b)) + wx1 * (
                    i0 == colf + f32(b - 1)
                )
                acc_b = acc_b + cx * Vb[b][a + r : a + r + br, :]
            out = out + ry * acc_b
        return out * vl

    def sbody(s, carry):
        x = xs[s, PAD_TOP : PAD_TOP + br, :]
        y = ys[s, PAD_TOP : PAD_TOP + br, :]
        vl = (vs[s, PAD_TOP : PAD_TOP + br, :] > i32(0)).astype(f32)

        def vel(px, py):
            ux = _do_sample(Vxb, vx_rows, nx + 1,
                            px * inv_dx, py * inv_dy + f32(0.5), vl)
            uy = _do_sample(Vyb, vy_rows, nx + 2,
                            px * inv_dx + f32(0.5), py * inv_dy, vl)
            return ux, uy

        k1x, k1y = vel(x, y)
        k2x, k2y = vel(x + f32(0.5) * dt * k1x, y + f32(0.5) * dt * k1y)
        k3x, k3y = vel(x + f32(0.5) * dt * k2x, y + f32(0.5) * dt * k2y)
        k4x, k4y = vel(x + dt * k3x, y + dt * k3y)

        six = dt * f32(1.0 / 6.0)
        xn = x + six * (k1x + f32(2.0) * k2x + f32(2.0) * k3x + k4x)
        yn = y + six * (k1y + f32(2.0) * k2y + f32(2.0) * k3y + k4y)
        if periodic_x:
            # wrap into [0, lx) exactly like the XLA path's _wrap_x
            ox[s] = xn - f32(lx) * jnp.floor(xn * f32(1.0 / lx))
        else:
            ox[s] = jnp.clip(xn, f32(1e-6 * dx), f32(lx - 1e-6 * dx))
        oy[s] = jnp.clip(yn, f32(1e-6 * dy), f32(ly - 1e-6 * dy))
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(K), sbody, jnp.int32(0))


def _vmem_bytes(K: int, nx: int, br: int) -> int:
    """Scoped-VMEM model of one kernel instance: 3 marker windows
    (K, br+8, nx) + double-buffered output blocks (2 x 2 x (K, br, nx)) +
    2 velocity windows + per-slot temporaries.  Calibrated against Mosaic's
    measured accounting (K=18 nx=2048 br=8 -> 18.02 MB actual vs 13.6 MB
    modeled, i.e. x1.32; the dispatcher applies x1.45 for margin)."""
    return (3 * K * (br + 8) * nx + 4 * K * br * nx
            + 2 * (br + 8) * (nx + 128) + 24 * br * nx) * 4


_VMEM_LIMIT = int(15.0 * 1024 * 1024 / 1.45)


def advect_slot_chunk(ny: int, nx: int, K: int, block_rows: int = 8):
    """Largest per-call slot count whose kernel instance fits scoped VMEM
    (the slot axis is embarrassingly parallel for advection, so oversized
    shapes — e.g. 2048^2 x K18 — run in ceil(K/chunk) kernel calls).
    None if the shape can't run at all."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return None
    br = block_rows
    if not (nx % 128 == 0 and ny % br == 0 and ny >= br
            and platform not in ("cpu", "gpu")):
        return None
    for n in range(1, K + 1):
        kc = -(-K // n)  # ceil(K / n) slots per call
        if _vmem_bytes(kc, nx, br) <= _VMEM_LIMIT:
            return kc
    return None


def advect_rk4_eligible(ny: int, nx: int, K: int, block_rows: int = 8) -> bool:
    return advect_slot_chunk(ny, nx, K, block_rows) is not None


def advect_block_eligible(by: int, bx: int, K: int,
                          block_rows: int = 8) -> bool:
    """Per-shard eligibility for the halo-frame dispatch (lanes pad to
    ceil(bx/128)*128)."""
    W = -(-bx // 128) * 128
    br = block_rows
    return (by % br == 0 and by >= br
            and _vmem_bytes(K, W, br) <= _VMEM_LIMIT)


def advect_block_pallas(xb, yb, vb, vx_ext, vy_ext, dt, grid: StaggeredGrid,
                        row_base, col_base, reach: int,
                        block_rows: int = 8, interpret: bool = False):
    """Per-shard fused RK4 on one device's marker block — the Pallas path
    of parallel/halo_markers.advect_rk4_halo's shard_map body.

    ``xb``/``yb``/``vb``: the block's own (by, bx, K) positions/valid;
    ``vx_ext``/``vy_ext``: the exchanged velocity windows built by
    advect_rk4_halo (frames: row q = vx_p/vy_p row row_base + q - reach,
    col l = col col_base + l - reach — exactly the global kernel's padded
    layout shifted by the bases).  Returns (x', y') of shape (by, bx, K)."""
    by, bx, K = xb.shape
    br = block_rows
    r = reach
    f32, i32 = jnp.float32, jnp.int32
    W = -(-bx // 128) * 128
    Wv = W + 128

    def prep_m(arr, dtype):
        t = jnp.transpose(arr.astype(dtype), (2, 0, 1))
        return jnp.pad(t, ((0, 0), (PAD_TOP, PAD_BOT), (0, W - bx)))

    xs = prep_m(xb, f32)
    ys = prep_m(yb, f32)
    vs = prep_m(vb, i32)

    nb = by // br
    hpad = nb * br + 8

    def prep_v(ve):
        rows, cols = ve.shape
        return jnp.pad(ve.astype(f32), ((0, hpad - rows), (0, Wv - cols)))

    vxp = prep_v(vx_ext)
    vyp = prep_v(vy_ext)

    in_spec = pl.BlockSpec(memory_space=pl.ANY)
    dt_arr = jnp.zeros((8, 128), f32)
    dt_arr = dt_arr.at[0, 0].set(jnp.asarray(dt, f32))
    dt_arr = dt_arr.at[0, 1].set(jnp.asarray(row_base, f32))
    dt_arr = dt_arr.at[0, 2].set(jnp.asarray(col_base, f32))

    out3 = pl.BlockSpec((K, br, W), lambda i: (i * 0, i, i * 0),
                        memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((8, 128), f32),
        pltpu.VMEM((K, br + 8, W), f32),
        pltpu.VMEM((K, br + 8, W), f32),
        pltpu.VMEM((K, br + 8, W), i32),
        pltpu.VMEM((br + 8, Wv), f32),
        pltpu.VMEM((br + 8, Wv), f32),
        pltpu.SemaphoreType.DMA((6,)),
    ]
    kernel = functools.partial(
        _kernel, br=br, K=K, ny=grid.ny, nx=grid.nx, dx=float(grid.dx),
        dy=float(grid.dy), reach=r, vx_rows=grid.ny + 2, vy_rows=grid.ny + 1,
        lx=float(grid.lx), ly=float(grid.ly), nxl=W, with_bases=True,
    )
    ox, oy = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[in_spec] * 6,
        out_specs=[out3, out3],
        out_shape=[jax.ShapeDtypeStruct((K, by, W), f32)] * 2,
        scratch_shapes=scratch,
        interpret=interpret,
    )(dt_arr, xs, ys, vs, vxp, vyp)

    def unprep(t):
        return jnp.transpose(t[:, :, :bx], (1, 2, 0)).astype(xb.dtype)

    return unprep(ox), unprep(oy)


def advect_rk4_pallas(bm, vx, vy, dt, grid: StaggeredGrid, bcs: VelocityBCs,
                      stage_reach: int = 1, block_rows: int = 8,
                      interpret: bool = False, slot_chunk: int | None = None):
    """Drop-in replacement for `bucket_advect_rk4` on eligible shapes."""
    ny, nx, K = bm.x.shape
    br = block_rows
    r = stage_reach
    f32, i32 = jnp.float32, jnp.int32

    # ghost-padded velocity lattices (same construction as the XLA path)
    periodic = bcs.periodic_x
    top = bcs.s_top * vx[:1] + (1.0 - bcs.s_top) * bcs.vt_top
    bot = bcs.s_bottom * vx[-1:] + (1.0 - bcs.s_bottom) * bcs.vt_bottom
    vx_p = jnp.concatenate([top, vx, bot], axis=0)  # (ny+2, nx+1)
    if periodic:
        left, right = vy[:, -1:], vy[:, :1]
    else:
        left = bcs.s_left * vy[:, :1] + (1.0 - bcs.s_left) * bcs.vt_left
        right = bcs.s_right * vy[:, -1:] + (1.0 - bcs.s_right) * bcs.vt_right
    vy_p = jnp.concatenate([left, vy, right], axis=1)  # (ny+1, nx+2)

    def prep_m(arr, dtype):
        t = jnp.transpose(arr.astype(dtype), (2, 0, 1))
        return jnp.pad(t, ((0, 0), (PAD_TOP, PAD_BOT), (0, 0)))

    xs = prep_m(bm.x, f32)
    ys = prep_m(bm.y, f32)
    vs = prep_m(bm.valid, i32)

    # velocity windows: pad `r` rows/lanes on top/left so padded row/lane
    # q holds array row/lane q - r; height covers the last block's window
    W = nx + 128
    nb = ny // br

    def prep_v(vp, col_offset=0):
        rows, cols = vp.shape
        hpad = nb * br + 8  # window start max = (nb-1)*br, depth br+8
        if periodic:
            # padded lane q holds array col q - r, WRAPPED: array col c maps
            # to core col (c - col_offset) mod nx (core = the unique period;
            # same convention as the XLA _sample_padded periodic extension)
            import numpy as np

            core = vp[:, col_offset : col_offset + nx]
            idx = (np.arange(W) - r - col_offset) % nx
            ext = core[:, idx].astype(f32)
            return jnp.pad(ext, ((r, hpad - rows - r), (0, 0)))
        return jnp.pad(vp.astype(f32),
                       ((r, hpad - rows - r), (r, W - cols - r)))

    vxp = prep_v(vx_p, col_offset=0)
    vyp = prep_v(vy_p, col_offset=1)

    in_spec = pl.BlockSpec(memory_space=pl.ANY)
    dt_arr = jnp.broadcast_to(jnp.asarray(dt, f32), (8, 128))

    def run(xs_c, ys_c, vs_c):
        kc = xs_c.shape[0]
        out3 = pl.BlockSpec((kc, br, nx), lambda i: (i * 0, i, i * 0),
                            memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((8, 128), f32),
            pltpu.VMEM((kc, br + 8, nx), f32),
            pltpu.VMEM((kc, br + 8, nx), f32),
            pltpu.VMEM((kc, br + 8, nx), i32),
            pltpu.VMEM((br + 8, W), f32),
            pltpu.VMEM((br + 8, W), f32),
            pltpu.SemaphoreType.DMA((6,)),
        ]
        kernel = functools.partial(
            _kernel, br=br, K=kc, ny=ny, nx=nx, dx=float(grid.dx),
            dy=float(grid.dy), reach=r, vx_rows=ny + 2, vy_rows=ny + 1,
            lx=float(grid.lx), ly=float(grid.ly), periodic_x=periodic,
        )
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[in_spec] * 6,
            out_specs=[out3, out3],
            out_shape=[jax.ShapeDtypeStruct((kc, ny, nx), f32)] * 2,
            scratch_shapes=scratch,
            interpret=interpret,
        )(dt_arr, xs_c, ys_c, vs_c, vxp, vyp)

    # slot-chunked dispatch: each marker's integration is independent, so
    # oversized shapes run in several bit-identical kernel calls
    if slot_chunk is not None:
        kc = slot_chunk
    else:
        kc = advect_slot_chunk(ny, nx, K, br) if not interpret else K
        if kc is None:
            kc = K  # caller gated on eligibility; preserve old behavior
    if kc >= K:
        ox, oy = run(xs, ys, vs)
    else:
        oxs, oys = [], []
        for s in range(0, K, kc):
            o1, o2 = run(xs[s:s + kc], ys[s:s + kc], vs[s:s + kc])
            oxs.append(o1)
            oys.append(o2)
        ox = jnp.concatenate(oxs, axis=0)
        oy = jnp.concatenate(oys, axis=0)

    def unprep(t):
        return jnp.transpose(t, (1, 2, 0)).astype(bm.x.dtype)

    return bm.replace(x=unprep(ox), y=unprep(oy))
