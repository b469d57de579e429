"""Per-shard Pallas stencil kernel inside the explicit-halo shard_map path
(ops/pallas/block_stencil_kernel.py) — round-4 verdict item 1: the fused
stencil arithmetic now runs per shard body, so multi-chip explicit-halo
runs keep the single-chip kernel wins.

All tests run the kernel in interpret mode on the 8-virtual-device CPU mesh
and assert equivalence against (a) the jnp explicit-halo path and (b) the
global single-device operator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.ops.stokes import stokes_operator
from pylamp_tpu.parallel.halo_ops import halo_eligible, stokes_operator_halo
from pylamp_tpu.parallel.mesh import make_mesh

GRID = StaggeredGrid(nx=64, ny=64, lx=1.3, ly=1.0)


@pytest.fixture(scope="module")
def mesh():
    m = make_mesh(8)
    assert halo_eligible(GRID, m)
    return m


def _fields(seed=7, dtype=jnp.float32, grid=GRID):
    rng = np.random.default_rng(seed)
    vx = jnp.asarray(rng.normal(size=grid.shape_vx), dtype)
    vy = jnp.asarray(rng.normal(size=grid.shape_vy), dtype)
    p = jnp.asarray(rng.normal(size=grid.shape_center), dtype)
    eta_s = jnp.asarray(
        np.exp(3 * rng.normal(size=(grid.ny + 1, grid.nx + 1))), dtype
    )
    eta_n = jnp.asarray(np.exp(3 * rng.normal(size=grid.shape_center)), dtype)
    return vx, vy, p, eta_s, eta_n


@pytest.mark.parametrize("bc", ["free_slip", "no_slip"])
def test_saddle_block_matches_jnp_halo_and_global(mesh, bc):
    bcs = VelocityBCs(top=bc, bottom=bc, left=bc, right=bc)
    vx, vy, p, es, en = _fields()
    kcont, kbnd = 0.73, 1.9

    ref = stokes_operator(vx, vy, p, es, en, GRID, bcs, kcont=kcont,
                          kbnd=kbnd)
    jnp_halo = jax.jit(
        lambda *a: stokes_operator_halo(*a, GRID, bcs, mesh, kcont=kcont,
                                        kbnd=kbnd)
    )(vx, vy, p, es, en)
    got = jax.jit(
        lambda *a: stokes_operator_halo(*a, GRID, bcs, mesh, kcont=kcont,
                                        kbnd=kbnd, use_pallas=True,
                                        interpret=True)
    )(vx, vy, p, es, en)

    for g, j, r, name in zip(got, jnp_halo, ref, ("rx", "ry", "rc")):
        scale = np.max(np.abs(np.asarray(r))) or 1.0
        # identical algebra, different reduction shapes: fp32 tolerance
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(j) / scale, atol=5e-6,
            err_msg=f"{name} vs jnp halo"
        )
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(r) / scale, atol=5e-6,
            err_msg=f"{name} vs global"
        )


def test_momentum_block_matches_global(mesh):
    """The momentum-only form (with_p=False) the MG smoothers apply."""
    from pylamp_tpu.ops.pallas.block_stencil_kernel import (
        block_stencil_eligible,
        saddle_block_pallas,
    )

    assert block_stencil_eligible(
        GRID.ny // 2, GRID.nx // 4, jnp.float32, interpret=True
    )
    bcs = VelocityBCs()
    vx, vy, p, es, en = _fields(seed=21)
    kbnd = 1.0

    # single "shard" spanning the whole grid: build the extended arrays by
    # hand (BC ghosts all around) and check the kernel against the global
    # operator's interior rows
    vx_ext = jnp.concatenate(
        [bcs.s_top * vx[:1], vx, bcs.s_bottom * vx[-1:]], axis=0
    )
    vx_ext = jnp.concatenate(
        [jnp.zeros_like(vx_ext[:, :1]), vx_ext[:, :-1], vx_ext[:, -1:]],
        axis=1,
    )  # left halo unused (Dirichlet col), interior cols + true last col
    vy_ext = jnp.concatenate(
        [jnp.zeros_like(vy[:1]), vy[:-1], vy[-1:]], axis=0
    )
    vy_ext = jnp.concatenate(
        [bcs.s_left * vy_ext[:, :1], vy_ext, bcs.s_right * vy_ext[:, -1:]],
        axis=1,
    )
    es_ext = es
    en_ext = jnp.pad(en, ((1, 1), (1, 1)))
    p_ext = jnp.pad(p, ((1, 1), (1, 1)))

    rx_k, ry_k = saddle_block_pallas(
        vx_ext, vy_ext, p_ext, es_ext, en_ext, GRID, with_p=False,
        interpret=True,
    )
    rx, ry, _ = stokes_operator(
        vx, vy, jnp.zeros_like(p), es, en, GRID, bcs, kcont=1.0, kbnd=kbnd
    )
    scale = float(np.max(np.abs(np.asarray(rx))))
    # interior rows/cols only (Dirichlet rows are the caller's patches)
    np.testing.assert_allclose(
        np.asarray(rx_k[:, 1:]) / scale,
        np.asarray(rx[:, 1:-1]) / scale, atol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ry_k[1:, :]) / scale,
        np.asarray(ry[1:-1, :]) / scale, atol=5e-6,
    )


def test_periodic_wrap_halo_matches_global(mesh):
    """Periodic side walls through the explicit-halo engine (round-4
    verdict item 6): ring ppermute over the torus seam, half-convention
    seam rows — against the global periodic operator, with and without
    the per-shard Pallas kernel."""
    bcs = VelocityBCs(left="periodic", right="periodic")
    vx, vy, p, es, en = _fields(seed=29)
    # solution arrays carry the duplicated seam column; eta_s seam-consistent
    vx = vx.at[:, -1].set(vx[:, 0])
    es = es.at[:, -1].set(es[:, 0])
    kcont, kbnd = 0.9, 2.2

    ref = stokes_operator(vx, vy, p, es, en, GRID, bcs, kcont=kcont,
                          kbnd=kbnd)
    for use_pallas in (False, True):
        got = jax.jit(
            lambda *a, up=use_pallas: stokes_operator_halo(
                *a, GRID, bcs, mesh, kcont=kcont, kbnd=kbnd,
                use_pallas=up, interpret=True)
        )(vx, vy, p, es, en)
        for g, r, name in zip(got, ref, ("rx", "ry", "rc")):
            scale = np.max(np.abs(np.asarray(r))) or 1.0
            np.testing.assert_allclose(
                np.asarray(g) / scale, np.asarray(r) / scale, atol=5e-6,
                err_msg=f"{name} (pallas={use_pallas})"
            )
