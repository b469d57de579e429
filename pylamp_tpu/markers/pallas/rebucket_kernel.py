"""Pallas TPU kernel: marker re-bucketing (the 3x3 one-hot repack).

The XLA rebucket (markers/bucket.py) runs 9K sequential slot insertions,
each a full-HBM pass over every (ny, nx, K) output array — ~107 ms/step at
1024x256xK16 (measured v5e), ~20 GB of HBM traffic, all of it avoidable:
the insertion state (outputs + per-cell counts) fits comfortably in VMEM
for a row block.  This kernel is the marker-transfer native kernel the
BASELINE north star prescribes (SURVEY.md §2.2):

- arrays are transposed to slot-major (K, ny+2*PAD, nx) on the host (one
  cheap relayout per rebucket), which makes every per-slot slab a
  perfectly-tiled 2-D (rows, nx) plane — no 16-lane minor-dim geometry
  anywhere inside the kernel;
- each grid step DMAs ONE rank-3 window per array (all K slabs, br+2 halo
  rows) into VMEM, runs the exact insertion order of the XLA loop
  ((a, b) slab-major, slot-minor) on VMEM-resident state, and writes the
  repacked block back with one rank-3 DMA per array;
- insertion is branch-free VPU arithmetic on (br, nx) planes: take flags
  from the candidate's target cell, `count == k` one-hot writes into the
  k-th output slab.

Result equality: slot-for-slot identical to markers/bucket.py `rebucket`
(same insertion order, same overflow-drop rule) — asserted by
tests/test_rebucket_kernel.py.  f32 positions/T, i32 mat, i32 valid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pylamp_tpu.core.grid import StaggeredGrid

PAD_TOP = 1   # one halo row above ...
PAD_BOT = 15  # ... and enough below that every 16-row aligned window fits:
# block i needs original rows [i*br-1, i*br+br], i.e. padded rows
# [i*br, i*br+br+2) — an 8-aligned window start with a fixed 16-row read


def _kernel(xs_h, ys_h, Ts_h, ms_h, vs_h, ox, oy, oT, om, ov, oc,
            xs, ys, Ts, ms, vs, sems, *, br, K, ny, nx, dx, dy,
            periodic_x=False, bases_h=None, bases_v=None, nlanes=None):
    """Grid dim 0 = row blocks.  Inputs stay in HBM (overlapping halo
    windows are not expressible as BlockSpec blocks) and are DMA'd per
    block into the (K, br+2*PAD, nx) scratch buffers; outputs are written
    through non-overlapping (K, br, nx) VMEM blocks plus the (br, nx)
    arrivals count.

    HALO FRAME (``bases_h`` set — the per-shard dispatch inside the
    explicit-halo shard_map engine, parallel/halo_markers.py): the input
    covers one device's cell block EXTENDED by a one-deep exchanged marker
    ring — padded row 0 is the halo row (playing PAD_TOP's role), lane 0
    the halo column, lanes > bx+1 zero (invalid).  ``bases_h`` carries the
    traced (row_base, col_base) = global indices of the block's first OWN
    cell; ``ny``/``nx`` stay the GLOBAL grid shape (target-cell clips),
    ``nlanes`` the padded lane count.  shift_x drops its domain-edge masks:
    halo lanes / zero pads supply physically-correct or invalid candidates,
    and the take mask (target cell == own global cell) filters the rest.
    Output lanes outside [1, bx] are garbage the wrapper crops."""
    i = pl.program_id(0)
    r0 = i * br  # first global row of this block

    halo = bases_h is not None
    W = nlanes if halo else nx

    row0 = i * jnp.int32(br)
    # i32 semaphore indices: bare python ints are i64 under x64, which
    # Mosaic's memref slicing rejects
    copies = [
        pltpu.make_async_copy(
            h.at[:, pl.ds(row0, br + PAD_TOP + 7), :], b,
            sems.at[jnp.int32(n)]
        )
        for n, (h, b) in enumerate(
            [(xs_h, xs), (ys_h, ys), (Ts_h, Ts), (ms_h, ms), (vs_h, vs)]
        )
    ]
    if halo:
        copies.append(pltpu.make_async_copy(bases_h, bases_v,
                                            sems.at[jnp.int32(5)]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    f32 = jnp.float32
    i32 = jnp.int32
    # keep the cell-size scalars f32: under jax_enable_x64 a bare python
    # float promotes the position arithmetic to f64, whose f64->i32
    # conversion recurses forever in Mosaic lowering
    dxf = f32(dx)
    dyf = f32(dy)

    if halo:
        # lane l holds global cell col (col_base - 1 + l); output row j of
        # block i is global cell row (row_base + i*br + j)
        row_base = bases_v[0, 0]
        col_base = bases_v[0, 1]
        col = (col_base - i32(1)) + lax.broadcasted_iota(i32, (br, W), 1)
        row = (row_base + r0) + lax.broadcasted_iota(i32, (br, W), 0)
    else:
        col = lax.broadcasted_iota(i32, (br, W), 1)
        row = r0 + lax.broadcasted_iota(i32, (br, W), 0)

    count = jnp.zeros((br, W), i32)
    ox[...] = jnp.zeros((K, br, W), f32)
    oy[...] = jnp.zeros((K, br, W), f32)
    oT[...] = jnp.zeros((K, br, W), f32)
    om[...] = jnp.zeros((K, br, W), i32)
    ov[...] = jnp.zeros((K, br, W), i32)

    def shift_x(p, b):
        # lane-rotate + edge mask (Mosaic supports tpu.rotate; lane
        # concatenation of mixed-offset vectors does not legalize).
        # Periodic side walls: the rotate's wrap-around IS the physical
        # neighbor (cell col 0's left neighbor is col nx-1), so keep it.
        if b == 0:
            return p
        r = jnp.roll(p, -b, axis=1)
        if halo:
            # halo lanes / zero pads already encode the edges; wrapped-in
            # lanes land in the pad region or carry invalid markers and the
            # take mask filters them
            return r
        if periodic_x:
            return r
        if b > 0:  # source col i+b: wrapped tail lanes are out of range
            return jnp.where(col < nx - b, r, jnp.zeros_like(r))
        return jnp.where(col >= -b, r, jnp.zeros_like(r))

    # Rolled loops: 9 static neighbor offsets x fori over K source slots x
    # fori over K destination slots.  Fully unrolling all 9*K*K inner
    # bodies (2916 at the production K=18) overflows the Python tracer and
    # bloats the Mosaic program; dynamic leading-dim ref indexing keeps the
    # rolled body legal.
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            r_lo = PAD_TOP + a  # local row of source row r0 + a

            def sbody(s, count, a=a, b=b, r_lo=r_lo):
                cx = shift_x(xs[s, r_lo : r_lo + br, :], b)
                cy = shift_x(ys[s, r_lo : r_lo + br, :], b)
                cT = shift_x(Ts[s, r_lo : r_lo + br, :], b)
                cm = shift_x(ms[s, r_lo : r_lo + br, :], b)
                cv = shift_x(vs[s, r_lo : r_lo + br, :], b)
                # target cell of the candidate marker
                # i32-typed bounds: python-int bounds promote the clip to
                # i64 under jax_enable_x64, and Mosaic's i64 conversion
                # helper recurses forever
                ti = jnp.clip((cx / dxf).astype(i32), i32(0), i32(nx - 1))
                tj = jnp.clip((cy / dyf).astype(i32), i32(0), i32(ny - 1))
                take = (cv > i32(0)) & (tj == row) & (ti == col)
                can = take & (count < i32(K))

                # accumulate straight into the VMEM output blocks: keeping
                # 5K live register planes instead blows the vector stack
                # (measured 27M vs the 16M scoped-vmem limit)
                def kbody(k, carry):
                    hit = can & (count == k)
                    ox[k] = jnp.where(hit, cx, ox[k])
                    oy[k] = jnp.where(hit, cy, oy[k])
                    oT[k] = jnp.where(hit, cT, oT[k])
                    om[k] = jnp.where(hit, cm, om[k])
                    ov[k] = jnp.where(hit, jnp.int32(1), ov[k])
                    return carry

                lax.fori_loop(i32(0), i32(K), kbody, i32(0))
                return count + take.astype(i32)

            count = lax.fori_loop(i32(0), i32(K), sbody, count)

    oc[...] = count


def rebucket_block_eligible(by: int, bx: int, K: int,
                            block_rows: int = 8) -> bool:
    """Per-shard eligibility for the halo-frame dispatch: the padded lane
    count is ceil((bx+2)/128)*128 and rows must split into blocks."""
    W = -(-(bx + 2) // 128) * 128
    br = block_rows
    vmem = 5 * K * (br + 8) * W * 4 + 5 * K * br * W * 4
    return by % br == 0 and by >= br and vmem <= 12 * 1024 * 1024


def rebucket_block_pallas(xe, ye, Te, me, ve, grid: StaggeredGrid,
                          row_base, col_base, block_rows: int = 8,
                          interpret: bool = False, vma=None):
    """Per-shard rebucket on a one-ring-EXTENDED marker block — the Pallas
    path of parallel/halo_markers.rebucket_halo's shard_map body.

    ``xe``..``ve``: (by+2, bx+2, K) extended arrays (rows/cols -1..by/bx of
    the block frame; ``ve`` int32, ppermute edge fill = 0 = invalid).
    ``row_base``/``col_base``: traced global indices of the block's first
    OWN cell.  Returns (x, y, T, mat, valid(int32), count) of shape
    (by, bx, K) / (by, bx), bit-identical to the XLA one-hot repack (same
    candidate order)."""
    bye, bxe, K = xe.shape
    by, bx = bye - 2, bxe - 2
    br = block_rows
    W = -(-(bx + 2) // 128) * 128
    f32, i32 = jnp.float32, jnp.int32

    def prep(arr, dtype):
        # (by+2, bx+2, K) -> slot-major (K, by+16, W): the halo row plays
        # PAD_TOP's role; zero row/lane pads are invalid markers
        t = jnp.transpose(arr.astype(dtype), (2, 0, 1))
        return jnp.pad(t, ((0, 0), (0, 14), (0, W - bxe)))

    xs = prep(xe, f32)
    ys = prep(ye, f32)
    Ts = prep(Te, f32)
    ms = prep(me, i32)
    vs = prep(ve, i32)
    bases = jnp.broadcast_to(
        jnp.stack([jnp.asarray(row_base, i32), jnp.asarray(col_base, i32)]),
        (8, 2),
    )
    bases = jnp.pad(bases, ((0, 0), (0, 126)))  # (8, 128) tile

    nb = by // br
    in_spec = pl.BlockSpec(memory_space=pl.ANY)
    out3 = pl.BlockSpec((K, br, W), lambda i: (i * 0, i, i * 0),
                        memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((br, W), lambda i: (i, i * 0), memory_space=pltpu.VMEM)

    import functools

    kernel = functools.partial(
        _kernel, br=br, K=K, ny=grid.ny, nx=grid.nx, dx=float(grid.dx),
        dy=float(grid.dy), nlanes=W,
    )

    def body(bases_h, xs_h, ys_h, Ts_h, ms_h, vs_h, ox, oy, oT, om, ov, oc,
             xs_v, ys_v, Ts_v, ms_v, vs_v, bases_v, sems):
        kernel(xs_h, ys_h, Ts_h, ms_h, vs_h, ox, oy, oT, om, ov, oc,
               xs_v, ys_v, Ts_v, ms_v, vs_v, sems,
               bases_h=bases_h, bases_v=bases_v)

    scratch = [
        pltpu.VMEM((K, br + PAD_TOP + 7, W), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), i32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), i32),
        pltpu.VMEM((8, 128), i32),
        pltpu.SemaphoreType.DMA((6,)),
    ]
    # inside shard_map the outputs must declare their mesh-axis variance
    _vma = frozenset(vma) if vma else None

    def _sds(shape, dtype):
        if _vma is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        return jax.ShapeDtypeStruct(shape, dtype, vma=_vma)

    ox, oy, oT, om, ov, oc = pl.pallas_call(
        body,
        grid=(nb,),
        in_specs=[in_spec] * 6,
        out_specs=[out3, out3, out3, out3, out3, out2],
        out_shape=[
            _sds((K, by, W), f32),
            _sds((K, by, W), f32),
            _sds((K, by, W), f32),
            _sds((K, by, W), i32),
            _sds((K, by, W), i32),
            _sds((by, W), i32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(bases, xs, ys, Ts, ms, vs)

    def unprep(t, dtype):
        return jnp.transpose(t[:, :, 1 : bx + 1], (1, 2, 0)).astype(dtype)

    return (
        unprep(ox, xe.dtype),
        unprep(oy, ye.dtype),
        unprep(oT, Te.dtype),
        unprep(om, me.dtype),
        unprep(ov, i32),
        oc[:, 1 : bx + 1],
    )


def rebucket_eligible(ny: int, nx: int, K: int, block_rows: int = 8) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    # VMEM budget: 5 input windows (K, br+8, nx) + 5 output blocks
    # (K, br, nx) at 4 B each must fit the 16 MB scoped limit with
    # headroom for temporaries (measured: K=18 at nx=2048 wants 22.5 MB
    # and fails Mosaic compile; K=18 at nx=1024 fits).  Grids beyond the
    # budget fall back to the XLA repack — a 2-D column-blocked variant
    # was measured 3.4x SLOWER at nx<=1024 (lane-misaligned halo slices),
    # so full-width rows stay the layout of record.
    br = block_rows
    vmem = 5 * K * (br + 8) * nx * 4 + 5 * K * br * nx * 4
    return (
        nx % 128 == 0
        and ny % br == 0
        and ny >= br
        and vmem <= 12 * 1024 * 1024
        and platform not in ("cpu", "gpu")
    )


def rebucket_pallas(bm, grid: StaggeredGrid, block_rows: int = 8,
                    interpret: bool = False, periodic_x: bool = False):
    """Drop-in replacement for markers/bucket.py ``rebucket`` on eligible
    shapes (nx % 128 == 0): returns (new_bm, dropped).  ``periodic_x``
    wraps the 3x3 exchange in x (markers crossing the seam repack into
    the opposite edge column, positions already wrapped by advection)."""
    from pylamp_tpu.markers.bucket import BucketedMarkers

    ny, nx, K = bm.x.shape
    br = block_rows
    f32, i32 = jnp.float32, jnp.int32

    def prep(arr, dtype):
        # (ny, nx, K) -> slot-major (K, PAD_TOP + ny + PAD_BOT, nx); pad
        # rows are zeros = invalid markers, so halo reads take nothing
        t = jnp.transpose(arr.astype(dtype), (2, 0, 1))
        return jnp.pad(t, ((0, 0), (PAD_TOP, PAD_BOT), (0, 0)))

    xs = prep(bm.x, f32)
    ys = prep(bm.y, f32)
    Ts = prep(bm.T, f32)
    ms = prep(bm.mat, i32)
    vs = prep(bm.valid, i32)

    nb = ny // br
    in_spec = pl.BlockSpec(memory_space=pl.ANY)
    out3 = pl.BlockSpec((K, br, nx), lambda i: (i * 0, i, i * 0),
                        memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec((br, nx), lambda i: (i, i * 0), memory_space=pltpu.VMEM)

    import functools

    kernel = functools.partial(
        _kernel, br=br, K=K, ny=ny, nx=nx, dx=float(grid.dx),
        dy=float(grid.dy), periodic_x=periodic_x,
    )
    scratch = [
        pltpu.VMEM((K, br + PAD_TOP + 7, nx), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, nx), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, nx), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, nx), i32),
        pltpu.VMEM((K, br + PAD_TOP + 7, nx), i32),
        pltpu.SemaphoreType.DMA((5,)),
    ]
    ox, oy, oT, om, ov, oc = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[in_spec] * 5,
        out_specs=[out3, out3, out3, out3, out3, out2],
        out_shape=[
            jax.ShapeDtypeStruct((K, ny, nx), f32),
            jax.ShapeDtypeStruct((K, ny, nx), f32),
            jax.ShapeDtypeStruct((K, ny, nx), f32),
            jax.ShapeDtypeStruct((K, ny, nx), i32),
            jax.ShapeDtypeStruct((K, ny, nx), i32),
            jax.ShapeDtypeStruct((ny, nx), i32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(xs, ys, Ts, ms, vs)

    def unprep(t, dtype):
        return jnp.transpose(t, (1, 2, 0)).astype(dtype)

    new = BucketedMarkers(
        x=unprep(ox, bm.x.dtype),
        y=unprep(oy, bm.y.dtype),
        T=unprep(oT, bm.T.dtype),
        mat=unprep(om, bm.mat.dtype),
        valid=unprep(ov, jnp.bool_),
    )
    dropped = jnp.sum(jnp.maximum(oc - K, 0))
    return new, dropped
