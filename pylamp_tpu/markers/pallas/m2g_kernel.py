"""Pallas TPU kernel: fused marker->grid transfer (all lattices, one pass).

The XLA bucketed transfer (markers/bucket.py `bucket_markers_to_grid`)
costs ~25 ms per call at 1024^2 x K18 on v5e — ~60x off the HBM bound —
because its 9-neighbor x 4-corner masked K-reductions materialize dozens
of (ny, nx, K) intermediates.  One production step makes 3 such calls in
the interp phase (eta->corner, eta->center, rho->vy) and 4 more in the
energy phase (T/k/rhoCp/H->corner), all over the SAME marker positions.

This kernel is the marker-transfer native kernel the BASELINE north star
prescribes (SURVEY.md §2.2, with markers/pallas/rebucket_kernel.py): it
reads the five marker state streams ONCE per step and accumulates every
requested (value, lattice) stream in VMEM:

- inputs use the same slot-major (K, 1 + ny + 15, nx) layout as the
  rebucket kernel (cheap relayout on the host);
- the grid runs over blocks of *node* rows; each block DMAs a (K, br+8,
  nx) halo window per stream (cell rows r0-1 .. r0+br) and computes its
  br node rows completely — output writes are disjoint, no overlap-add;
- marker properties (eta by viscosity law, Boussinesq rho, k, rhoCp, H)
  are evaluated in-kernel from (mat, T) via branch-free material-select
  chains (the material table is static);
- bilinear weights are built per x/y "kind" (corner-kind: node offset
  {0,+1}; center-kind: {-1,0,+1}) and shared across lattices: corner =
  corner_y (x) corner_x, center = center_y (x) center_x, vy = corner_y
  (x) center_x, vx = center_y (x) corner_x;
- per column-offset b the accumulation targets the marker's own lane
  (node col = cell col + b), so the kernel needs NO lane rotates at all:
  it emits one (rows, nx) plane per b and the caller combines them with
  two shifted pads (2-D XLA, negligible).

Weighted sums match the XLA path up to f32 summation order (the XLA path
reduces over K per neighbor-offset; the kernel accumulates slot-by-slot)
— equivalence is asserted to ~1e-5 relative in tests/test_m2g_kernel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pylamp_tpu.core.grid import StaggeredGrid

PAD_TOP = 1
PAD_BOT = 15

R_GAS = 8.314462618


def _mat_select(mt, vals, dtype=jnp.float32):
    """Branch-free material-id -> value select chain (static table)."""
    v = np.asarray(vals, np.float64)
    out = jnp.full(mt.shape, dtype(v[0]), dtype)
    for m in range(1, len(v)):
        if v[m] != v[0]:
            out = jnp.where(mt == jnp.int32(m), dtype(v[m]), out)
    return out


def _plan(phys_flags):
    """Static list of output streams: (name, lattice, n_boffsets)."""
    with_energy, with_h, with_ra, with_vx = phys_flags
    plan = [
        ("c_w", "corner", 2),
        ("c_eta", "corner", 2),
        ("n_w", "center", 3),
        ("n_eta", "center", 3),
        ("vy_w", "vy", 3),
        ("vy_rho", "vy", 3),
    ]
    if with_vx:
        plan += [("vx_w", "vx", 2), ("vx_rho", "vx", 2)]
    if with_energy:
        plan += [("c_T", "corner", 2), ("c_k", "corner", 2),
                 ("c_rhocp", "corner", 2)]
        if with_h:
            plan += [("c_H", "corner", 2)]
        if with_ra:
            plan += [("c_ra", "corner", 2)]
    return plan


def _kernel(xs_h, ys_h, Ts_h, ms_h, vs_h, *refs,
            br, K, ny, nx, dx, dy, tbl, eta_mode, eta_min, eta_max,
            phys_flags, n_out, periodic_x=False, nlanes=None,
            with_bases=False):
    """Grid dim 0 = node-row blocks; node rows [i*br, i*br + br).

    HALO FRAME (``with_bases``, the per-shard dispatch inside the
    explicit-halo shard_map engine): the input is one device's cell block
    extended by a one-deep exchanged marker ring — padded row 0 is the
    halo row (playing PAD_TOP's role), lane 0 the halo column, lanes >
    bx+1 zero (invalid).  A trailing bases scratch (DMA'd like the marker
    windows) carries the traced (row_base, col_base) global indices of the
    block's first OWN cell; ``ny``/``nx`` stay the GLOBAL grid shape
    (center-kind clamps), ``nlanes`` the padded lane count."""
    if with_bases:
        # arg order is (inputs..., outputs..., scratch...): the bases array
        # is the 6th INPUT, so it precedes the output refs
        bases_h = refs[0]
        out_refs = refs[1 : 1 + n_out]
        xs, ys, Ts, ms, vs, bases_v, sems = refs[1 + n_out :]
    else:
        out_refs = refs[:n_out]
        xs, ys, Ts, ms, vs, sems = refs[n_out:]
        bases_h = bases_v = None
    with_energy, with_h, with_ra, with_vx = phys_flags
    W = nlanes if nlanes is not None else nx

    i = pl.program_id(0)
    row0 = i * jnp.int32(br)  # == first node row; padded input row of cell
    # row (node_row - 1) thanks to PAD_TOP = 1

    copies = [
        pltpu.make_async_copy(
            h.at[:, pl.ds(row0, br + PAD_TOP + 7), :], b, sems.at[jnp.int32(n)]
        )
        for n, (h, b) in enumerate(
            [(xs_h, xs), (ys_h, ys), (Ts_h, Ts), (ms_h, ms), (vs_h, vs)]
        )
    ]
    if with_bases:
        copies.append(pltpu.make_async_copy(bases_h, bases_v,
                                            sems.at[jnp.int32(5)]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    f32 = jnp.float32
    i32 = jnp.int32
    inv_dx = f32(1.0 / dx)
    inv_dy = f32(1.0 / dy)

    for o in out_refs:
        o[...] = jnp.zeros((br, W), f32)

    colf = lax.broadcasted_iota(i32, (br + 2, W), 1).astype(f32)
    # global CELL row of each local slab row (local row l = cell row0-1+l)
    rowf = (row0 - i32(1) + lax.broadcasted_iota(i32, (br + 2, W), 0)).astype(f32)
    if with_bases:
        # halo frame: lane l = global cell col (col_base - 1 + l); padded
        # row p = global cell row (row_base + p - 1)
        colf = colf + (bases_v[0, 1] - f32(1.0))
        rowf = rowf + bases_v[0, 0]

    plan = _plan(phys_flags)
    sl = {0: (1, 0), 1: (0, 0), -1: (2, 0)}  # a -> slab row slice start

    def sbody(s, carry):
        x = xs[s, : br + 2, :]
        y = ys[s, : br + 2, :]
        T = Ts[s, : br + 2, :]
        mt = ms[s, : br + 2, :]
        vl = (vs[s, : br + 2, :] > i32(0)).astype(f32)

        # -- marker property values (static material table) --------------
        eta0 = _mat_select(mt, tbl["eta0"])
        T_ref = _mat_select(mt, tbl["T_ref"])
        eta = eta0
        laws = set(int(c) for c in tbl["law"])
        if 1 in laws:  # Frank-Kamenetskii
            gamma = _mat_select(mt, tbl["fk_gamma"])
            eta_fk = eta0 * jnp.exp(-gamma * (T - T_ref))
            lawp = _mat_select(mt, tbl["law"])
            eta = jnp.where(lawp == f32(1.0), eta_fk, eta)
        if 2 in laws:  # Arrhenius
            E = _mat_select(mt, tbl["E_act"])
            T_safe = jnp.maximum(T, f32(1e-30))
            Tr_safe = jnp.maximum(T_ref, f32(1e-30))
            eta_arr = eta0 * jnp.exp(
                E * (f32(1.0 / R_GAS) / T_safe) - E * (f32(1.0 / R_GAS) / Tr_safe)
            )
            lawp = _mat_select(mt, tbl["law"])
            eta = jnp.where(lawp == f32(2.0), eta_arr, eta)
        eta = jnp.clip(eta, f32(eta_min), f32(eta_max))
        if eta_mode == "geometric":
            eta = jnp.log(eta)
        elif eta_mode == "harmonic":
            eta = f32(1.0) / eta

        rho0 = _mat_select(mt, tbl["rho0"])
        alpha = _mat_select(mt, tbl["alpha"])
        rho = rho0 * (f32(1.0) - alpha * (T - T_ref))

        vals = {"c_eta": eta, "n_eta": eta, "vy_rho": rho, "vx_rho": rho,
                "c_w": None, "n_w": None, "vy_w": None, "vx_w": None}
        if with_energy:
            vals["c_T"] = T
            vals["c_k"] = _mat_select(mt, tbl["k"])
            vals["c_rhocp"] = rho0 * _mat_select(mt, tbl["cp"])
            if with_h:
                vals["c_H"] = _mat_select(mt, tbl["H"])
            if with_ra:
                vals["c_ra"] = rho0 * alpha

        # -- bilinear weights per x/y kind (valid mask folded into x) ----
        fx = x * inv_dx
        fy = y * inv_dy
        # corner-kind x: containing target cell == own cell
        txc = jnp.clip(fx - colf, f32(0.0), f32(1.0))
        cxc = {0: (f32(1.0) - txc) * vl, 1: txc * vl}
        # center-kind x: i0 = clip(floor(fx - .5), 0, nx-2); o_i in {-1, 0}
        # (periodic sides: no clamp — seam markers keep their natural
        # i0 = -1 / nx-1 and the caller's combine wraps the b planes)
        fxn = fx - f32(0.5)
        if periodic_x:
            i0n = jnp.floor(fxn)
        else:
            i0n = jnp.clip(jnp.floor(fxn), f32(0.0), f32(nx - 2))
        txn = jnp.clip(fxn - i0n, f32(0.0), f32(1.0))
        oim1 = (i0n == colf - f32(1.0)).astype(f32)
        oi0 = (i0n == colf).astype(f32)
        cxn = {
            -1: (f32(1.0) - txn) * oim1 * vl,
            0: ((f32(1.0) - txn) * oi0 + txn * oim1) * vl,
            1: txn * oi0 * vl,
        }
        # corner-kind y
        tyc = jnp.clip(fy - rowf, f32(0.0), f32(1.0))
        ryc = {0: f32(1.0) - tyc, 1: tyc}
        # center-kind y: j0 = clip(floor(fy - .5), 0, ny-2); o_j in {-1, 0}
        fyn = fy - f32(0.5)
        j0n = jnp.clip(jnp.floor(fyn), f32(0.0), f32(ny - 2))
        tyn = jnp.clip(fyn - j0n, f32(0.0), f32(1.0))
        ojm1 = (j0n == rowf - f32(1.0)).astype(f32)
        oj0 = (j0n == rowf).astype(f32)
        ryn = {
            -1: (f32(1.0) - tyn) * ojm1,
            0: (f32(1.0) - tyn) * oj0 + tyn * ojm1,
            1: tyn * oj0,
        }

        ykind = {"corner": ryc, "vy": ryc, "center": ryn, "vx": ryn}
        xkind = {"corner": cxc, "vx": cxc, "center": cxn, "vy": cxn}

        # -- accumulate: node (cell_row + a, cell_col + b) ----------------
        # group plan entries by lattice so each g = ry*cx is built once
        oidx = 0
        offsets = {}  # name -> list of out_ref indices per b
        for name, lat, nb_off in plan:
            offsets[name] = list(range(oidx, oidx + nb_off))
            oidx += nb_off

        for lat in ("corner", "center", "vy", "vx"):
            streams = [(nm, offsets[nm]) for nm, lt, _ in plan if lt == lat]
            if not streams:
                continue
            ry = ykind[lat]
            cx = xkind[lat]
            bs = sorted(cx.keys())
            for a in sorted(ry.keys()):
                st = sl[a][0]
                for bi, b in enumerate(bs):
                    g = (ry[a] * cx[b])[st : st + br, :]
                    for nm, idxs in streams:
                        v = vals[nm]
                        ref = out_refs[idxs[bi]]
                        if v is None:
                            ref[...] += g
                        else:
                            ref[...] += g * v[st : st + br, :]
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(K), sbody, jnp.int32(0))


def m2g_fused_block_eligible(by: int, bx: int, K: int,
                             block_rows: int = 8) -> bool:
    """Per-shard eligibility for the halo-frame dispatch (padded lane
    count ceil((bx+2)/128)*128; no slot chunking — the whole K must fit)."""
    W = -(-(bx + 2) // 128) * 128
    br = block_rows
    vmem = 5 * K * (br + 8) * W * 4 + 30 * (br + 2) * W * 4
    return by % br == 0 and by >= br and vmem <= 12 * 1024 * 1024


def m2g_fused_block_pallas(xe, ye, Te, me, ve, grid: StaggeredGrid, table,
                           phys, row_base, col_base,
                           with_energy: bool = False, with_ra: bool = False,
                           block_rows: int = 8, interpret: bool = False):
    """Per-shard fused marker->grid transfer on a one-ring-EXTENDED marker
    block — the Pallas path of parallel/halo_markers.m2g_fused_halo's
    shard_map body.

    ``xe``..``ve``: (by+2, bx+2, K) extended streams (``ve`` int32; the
    exchanged halo ring supplies the neighbor markers, so every node value
    this shard computes — including the shared seam rows/cols — is
    COMPLETE; no halo-fold needed).  Returns a dict of raw weighted-sum
    planes combined to the extended lane frame: ``out[name]`` has shape
    (by + 1, W) with lane l = global node col (col_base - 1 + l); the
    caller slices own cols (lanes 1..bx) + the +1 seam strips."""
    bye, bxe, K = xe.shape
    by, bx = bye - 2, bxe - 2
    br = block_rows
    W = -(-(bx + 2) // 128) * 128
    f32, i32 = jnp.float32, jnp.int32

    with_vx = phys.gx != 0.0
    with_h = bool(np.any(np.asarray(table.H) != 0.0))
    flags = (with_energy, with_h and with_energy, with_ra, with_vx)
    plan = _plan(flags)
    n_out = sum(p[2] for p in plan)

    def prep(arr, dtype):
        # halo row 0 plays PAD_TOP's role; pad rows to by+16 for the last
        # block's fixed 16-row DMA, lanes to W with invalid markers
        t = jnp.transpose(arr.astype(dtype), (2, 0, 1))
        return jnp.pad(t, ((0, 0), (0, 14), (0, W - bxe)))

    xs = prep(xe, f32)
    ys = prep(ye, f32)
    Ts = prep(Te, f32)
    ms = prep(me, i32)
    vs = prep(ve, i32)
    bases = jnp.zeros((8, 128), f32)
    bases = bases.at[0, 0].set(jnp.asarray(row_base, f32))
    bases = bases.at[0, 1].set(jnp.asarray(col_base, f32))

    nbn = by // br + 1  # node rows 0..by inclusive
    tbl = {f: np.asarray(getattr(table, f))
           for f in ("rho0", "alpha", "T_ref", "eta0", "fk_gamma", "E_act",
                     "k", "cp", "H", "law")}

    in_spec = pl.BlockSpec(memory_space=pl.ANY)
    out2 = pl.BlockSpec((br, W), lambda i: (i, i * 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, br=br, K=K, ny=grid.ny, nx=grid.nx, dx=float(grid.dx),
        dy=float(grid.dy), tbl=tbl, eta_mode=phys.eta_avg,
        eta_min=float(phys.eta_min), eta_max=float(phys.eta_max),
        phys_flags=flags, n_out=n_out, nlanes=W, with_bases=True,
    )
    scratch = [
        pltpu.VMEM((K, br + PAD_TOP + 7, W), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), f32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), i32),
        pltpu.VMEM((K, br + PAD_TOP + 7, W), i32),
        pltpu.VMEM((8, 128), f32),
        pltpu.SemaphoreType.DMA((6,)),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(nbn,),
        in_specs=[in_spec] * 6,
        out_specs=[out2] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nbn * br, W), f32)] * n_out,
        scratch_shapes=scratch,
        interpret=interpret,
    )(xs, ys, Ts, ms, vs, bases)

    # combine b-offset planes in the extended lane frame: F[l] = sum_b
    # P_b[l - b] (the plane stores each contribution at the marker's own
    # cell lane; node lane = cell lane + b)
    def shiftr(P, b):
        if b == 0:
            return P
        if b > 0:
            return jnp.pad(P[:, :-b], ((0, 0), (b, 0)))
        return jnp.pad(P[:, -b:], ((0, 0), (0, -b)))

    boff = {2: (0, 1), 3: (-1, 0, 1)}
    result = {}
    oidx = 0
    for name, lat, nb_off in plan:
        planes = outs[oidx : oidx + nb_off]
        F = jnp.zeros((by + 1, W), f32)
        for b, P in zip(boff[nb_off], planes):
            F = F + shiftr(P[: by + 1, :], b)
        result[name] = F
        oidx += nb_off
    return result, plan


def m2g_slot_chunk(ny: int, nx: int, K: int, block_rows: int = 8):
    """Largest per-call slot count whose kernel instance fits scoped VMEM.
    The raw weighted sums are additive across slots, so oversized shapes
    (e.g. 2048^2 x K18) run in ceil(K/chunk) calls whose outputs are
    summed.  None if even one slot per call doesn't fit."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return None
    br = block_rows
    if not (nx % 128 == 0 and ny % br == 0 and ny >= br
            and platform not in ("cpu", "gpu")):
        return None
    for n in range(1, K + 1):
        kc = -(-K // n)
        # input windows dominate; ~30 temporary planes of (br+2, nx) f32
        vmem = 5 * kc * (br + 8) * nx * 4 + 30 * (br + 2) * nx * 4
        if vmem <= 12 * 1024 * 1024:
            return kc
    return None


def m2g_fused_eligible(ny: int, nx: int, K: int, block_rows: int = 8) -> bool:
    return m2g_slot_chunk(ny, nx, K, block_rows) is not None


def m2g_fused_pallas(bm, grid: StaggeredGrid, table, phys,
                     block_rows: int = 8, with_energy: bool = False,
                     with_ra: bool = False, interpret: bool = False,
                     slot_chunk: int | None = None,
                     periodic_x: bool = False):
    """Fused marker->grid transfer of every per-step stream.

    Returns a dict of RAW weighted sums and weights per lattice (already
    combined to node-lattice shapes):
      eta_s_wv, c_w (corner, nx+1 wide), eta_n_wv, n_w (center),
      rho_vy_wv, vy_w, [rho_vx_wv, vx_w], and with ``with_energy``:
      T_wv, k_wv, rhocp_wv, [H_wv], [ra_wv] on the corner lattice.
    The caller divides by the weights and inverts the eta averaging
    transform (exactly like the XLA path).
    """
    ny, nx, K = bm.x.shape
    br = block_rows
    f32, i32 = jnp.float32, jnp.int32

    with_vx = phys.gx != 0.0
    with_h = bool(np.any(np.asarray(table.H) != 0.0))
    flags = (with_energy, with_h and with_energy, with_ra, with_vx)
    plan = _plan(flags)
    n_out = sum(p[2] for p in plan)

    def prep(arr, dtype):
        t = jnp.transpose(arr.astype(dtype), (2, 0, 1))
        return jnp.pad(t, ((0, 0), (PAD_TOP, PAD_BOT), (0, 0)))

    xs = prep(bm.x, f32)
    ys = prep(bm.y, f32)
    Ts = prep(bm.T, f32)
    ms = prep(bm.mat, i32)
    vs = prep(bm.valid, i32)

    # node rows 0..ny inclusive -> one extra block beyond ny/br
    nbn = ny // br + 1
    tbl = {f: np.asarray(getattr(table, f))
           for f in ("rho0", "alpha", "T_ref", "eta0", "fk_gamma", "E_act",
                     "k", "cp", "H", "law")}

    in_spec = pl.BlockSpec(memory_space=pl.ANY)
    out2 = pl.BlockSpec((br, nx), lambda i: (i, i * 0), memory_space=pltpu.VMEM)

    def run(xs_c, ys_c, Ts_c, ms_c, vs_c):
        kc = xs_c.shape[0]
        kernel = functools.partial(
            _kernel, br=br, K=kc, ny=ny, nx=nx, dx=float(grid.dx),
            dy=float(grid.dy), tbl=tbl, eta_mode=phys.eta_avg,
            eta_min=float(phys.eta_min), eta_max=float(phys.eta_max),
            phys_flags=flags, n_out=n_out, periodic_x=periodic_x,
        )
        scratch = [
            pltpu.VMEM((kc, br + PAD_TOP + 7, nx), f32),
            pltpu.VMEM((kc, br + PAD_TOP + 7, nx), f32),
            pltpu.VMEM((kc, br + PAD_TOP + 7, nx), f32),
            pltpu.VMEM((kc, br + PAD_TOP + 7, nx), i32),
            pltpu.VMEM((kc, br + PAD_TOP + 7, nx), i32),
            pltpu.SemaphoreType.DMA((5,)),
        ]
        return pl.pallas_call(
            kernel,
            grid=(nbn,),
            in_specs=[in_spec] * 5,
            out_specs=[out2] * n_out,
            out_shape=[jax.ShapeDtypeStruct((nbn * br, nx), f32)] * n_out,
            scratch_shapes=scratch,
            interpret=interpret,
        )(xs_c, ys_c, Ts_c, ms_c, vs_c)

    # slot-chunked dispatch for oversized shapes: the raw weighted sums
    # are additive across slots
    if slot_chunk is not None:
        kc = slot_chunk
    else:
        kc = m2g_slot_chunk(ny, nx, K, br) if not interpret else K
        if kc is None:
            kc = K
    if kc >= K:
        outs = run(xs, ys, Ts, ms, vs)
    else:
        outs = None
        for s in range(0, K, kc):
            o = run(xs[s:s + kc], ys[s:s + kc], Ts[s:s + kc],
                    ms[s:s + kc], vs[s:s + kc])
            outs = o if outs is None else [a + b for a, b in zip(outs, o)]

    # -- combine b-offset planes to node-lattice shapes -------------------
    def combine(planes, bs, rows, cols):
        """planes[k] holds contributions to node col = cell col + bs[k],
        stored at the cell's lane; shift-add into a (rows, cols) field.
        Periodic sides: node columns wrap with period nx, and nx+1-wide
        lattices re-emit the full seam sum in BOTH seam columns (exactly
        the XLA bucket_markers_to_grid convention)."""
        if periodic_x:
            Fu = jnp.zeros((rows, nx), f32)
            for b, P in zip(bs, planes):
                Fu = Fu + jnp.roll(P[:rows, :], b, axis=1)
            if cols == nx + 1:
                return jnp.concatenate([Fu, Fu[:, :1]], axis=1)
            return Fu
        F = jnp.zeros((rows, cols), f32)
        for b, P in zip(bs, planes):
            P = P[:rows, :]
            if cols == nx + 1:  # corner-kind x: b in {0, 1}
                F = F + jnp.pad(P, ((0, 0), (b, 1 - b)))
            else:  # center-kind x on an nx-wide lattice: b in {-1, 0, 1}
                if b == 0:
                    F = F + P
                elif b == 1:
                    F = F + jnp.pad(P[:, :-1], ((0, 0), (1, 0)))
                else:
                    F = F + jnp.pad(P[:, 1:], ((0, 0), (0, 1)))
        return F

    shapes = {"corner": (ny + 1, nx + 1), "center": (ny, nx),
              "vy": (ny + 1, nx), "vx": (ny, nx + 1)}
    boff = {2: (0, 1), 3: (-1, 0, 1)}
    result = {}
    oidx = 0
    for name, lat, nb_off in plan:
        rows, cols = shapes[lat]
        result[name] = combine(outs[oidx : oidx + nb_off], boff[nb_off],
                               rows, cols)
        oidx += nb_off
    return result
