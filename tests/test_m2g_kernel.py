"""The fused Pallas marker->grid kernel must match the XLA bucketed
transfers (markers/bucket.py) on every stream and lattice.

Equality is to f32 summation-order tolerance (~1e-5 relative): the XLA
path reduces over K per neighbor offset, the kernel accumulates slot by
slot.  Positions are in-cell (the kernel's precondition: m2g runs on
post-rebucket state only).  Interpret mode on CPU, tiny K (slow tier —
interpret-mode fori over VMEM refs is slow); production shapes were
A/B'd on a real v5e chip.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pylamp_tpu.core.grid import StaggeredGrid
from pylamp_tpu.markers.bucket import BucketedMarkers, bucket_markers_to_grid
from pylamp_tpu.markers.pallas.m2g_kernel import m2g_fused_pallas
from pylamp_tpu.models.config import PhysicsConfig
from pylamp_tpu.physics.materials import Material, MaterialTable


def _setup(ny=8, nx=128, K=3, seed=0):
    grid = StaggeredGrid(nx=nx, ny=ny, lx=1.0, ly=0.5)
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    ci = jnp.arange(nx)[None, :, None]
    cj = jnp.arange(ny)[:, None, None]
    jx = jax.random.uniform(ks[0], (ny, nx, K), minval=0.001, maxval=0.999)
    jy = jax.random.uniform(ks[1], (ny, nx, K), minval=0.001, maxval=0.999)
    x = ((ci + jx) * grid.dx).astype(jnp.float32)
    y = ((cj + jy) * grid.dy).astype(jnp.float32)
    T = jax.random.uniform(ks[2], (ny, nx, K), jnp.float32, 0.1, 1.0)
    mat = jax.random.randint(ks[3], (ny, nx, K), 0, 3)
    valid = jax.random.uniform(ks[4], (ny, nx, K)) < 0.8
    bm = BucketedMarkers(x=x, y=y, mat=mat, T=T, valid=valid)

    mats = (
        Material(name="a", rho0=3300.0, alpha=2.5e-5, T_ref=0.2, eta0=1e21,
                 viscosity="frank_kamenetskii", fk_gamma=6.9, k=3.0,
                 cp=1250.0, H=2e-8),
        Material(name="b", rho0=3200.0, eta0=1e19, k=100.0, cp=1000.0),
        Material(name="c", rho0=3350.0, eta0=1e23, k=3.3, cp=1200.0, H=1e-9),
    )
    table = MaterialTable(mats)
    phys = PhysicsConfig(materials=mats, eta_avg="geometric",
                         eta_min=1e18, eta_max=1e24, gx=0.0, gy=9.81)
    return bm, grid, table, phys


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


@pytest.mark.slow
def test_m2g_kernel_matches_xla_all_streams():
    bm, grid, table, phys = _setup()
    out = m2g_fused_pallas(bm, grid, table, phys, with_energy=True,
                           interpret=True)

    eta_m = jnp.clip(table.viscosity_of(bm.mat, bm.T), phys.eta_min,
                     phys.eta_max)
    rho_m = table.density(bm.mat, bm.T)
    k_m = table.conductivity(bm.mat, jnp.float32)
    rhocp_m = table.rho_cp(bm.mat, bm.T)
    H_m = table.heating(bm.mat, jnp.float32)

    # reference raw weighted sums: field * w (mode transforms inverted)
    def ref(vals, loc, mode):
        f, w = bucket_markers_to_grid(bm, vals, grid, loc, mode)
        if mode == "geometric":
            return jnp.where(w > 0, jnp.log(f) * w, 0.0), w
        return f * w, w

    r_eta_s, r_cw = ref(eta_m, "corner", "geometric")
    r_eta_n, r_nw = ref(eta_m, "center", "geometric")
    r_rho_vy, r_vyw = ref(rho_m, "vy", "arithmetic")
    r_T, _ = ref(bm.T, "corner", "arithmetic")
    r_k, _ = ref(k_m, "corner", "arithmetic")
    r_rcp, _ = ref(rhocp_m, "corner", "arithmetic")
    r_H, _ = ref(H_m, "corner", "arithmetic")

    tol = 2e-5
    assert _rel(out["c_w"], r_cw) < tol
    assert _rel(out["c_eta"], r_eta_s) < tol
    assert _rel(out["n_w"], r_nw) < tol
    assert _rel(out["n_eta"], r_eta_n) < tol
    assert _rel(out["vy_w"], r_vyw) < tol
    assert _rel(out["vy_rho"], r_rho_vy) < tol
    assert _rel(out["c_T"], r_T) < tol
    assert _rel(out["c_k"], r_k) < tol
    assert _rel(out["c_rhocp"], r_rcp) < tol
    assert _rel(out["c_H"], r_H) < tol


@pytest.mark.slow
def test_m2g_kernel_interp_only_and_vx():
    bm, grid, table, phys = _setup(seed=7)
    import dataclasses

    phys = dataclasses.replace(phys, gx=3.0)
    out = m2g_fused_pallas(bm, grid, table, phys, with_energy=False,
                           interpret=True)
    assert "c_T" not in out
    rho_m = table.density(bm.mat, bm.T)
    f, w = bucket_markers_to_grid(bm, rho_m, grid, "vx", "arithmetic")
    assert _rel(out["vx_w"], w) < 2e-5
    assert _rel(out["vx_rho"], f * w) < 2e-5


@pytest.mark.slow
def test_m2g_kernel_slot_chunked_matches():
    """Slot-chunked dispatch (oversized-shape fallback) sums per-chunk
    weighted sums; agreement with the single-call kernel is to f32
    summation-order tolerance."""
    bm, grid, table, phys = _setup(K=5, seed=3)
    a = m2g_fused_pallas(bm, grid, table, phys, with_energy=True,
                         interpret=True)
    b = m2g_fused_pallas(bm, grid, table, phys, with_energy=True,
                         interpret=True, slot_chunk=2)
    for k in a:
        sa, sb = np.asarray(a[k], np.float64), np.asarray(b[k], np.float64)
        scale = max(np.max(np.abs(sa)), 1e-300)
        assert np.max(np.abs(sa - sb)) / scale < 5e-6, k


@pytest.mark.slow
def test_m2g_kernel_periodic_matches_xla():
    """Periodic sides: wrapped combine + unclamped center-kind locate must
    match the XLA bucketed transfers (equal full values in both seam
    columns of the nx+1-wide lattices)."""
    bm, grid, table, phys = _setup(seed=13)
    out = m2g_fused_pallas(bm, grid, table, phys, with_energy=True,
                           interpret=True, periodic_x=True)

    eta_m = jnp.clip(table.viscosity_of(bm.mat, bm.T), phys.eta_min,
                     phys.eta_max)
    rho_m = table.density(bm.mat, bm.T)

    def ref(vals, loc, mode):
        f, w = bucket_markers_to_grid(bm, vals, grid, loc, mode,
                                      periodic_x=True)
        if mode == "geometric":
            return jnp.where(w > 0, jnp.log(f) * w, 0.0), w
        return f * w, w

    r_eta_s, r_cw = ref(eta_m, "corner", "geometric")
    r_eta_n, r_nw = ref(eta_m, "center", "geometric")
    r_rho_vy, r_vyw = ref(rho_m, "vy", "arithmetic")
    r_T, _ = ref(bm.T, "corner", "arithmetic")

    tol = 2e-5
    assert _rel(out["c_w"], r_cw) < tol
    assert _rel(out["c_eta"], r_eta_s) < tol
    assert _rel(out["n_w"], r_nw) < tol
    assert _rel(out["n_eta"], r_eta_n) < tol
    assert _rel(out["vy_w"], r_vyw) < tol
    assert _rel(out["vy_rho"], r_rho_vy) < tol
    assert _rel(out["c_T"], r_T) < tol
    # seam columns of the nx+1-wide lattices carry the identical full sum
    np.testing.assert_array_equal(np.asarray(out["c_w"][:, 0]),
                                  np.asarray(out["c_w"][:, -1]))
