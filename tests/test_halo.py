"""Explicit shard_map halo exchange must reproduce the single-device stencil
bit-for-bit (SURVEY.md §4 'Distributed')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pylamp_tpu.parallel.halo import diffusion_apply_sharded
from pylamp_tpu.parallel.mesh import make_mesh


def _reference_apply(T, kx, ky, rc, dx, dy):
    Tp = jnp.pad(T, 1)
    kxp = jnp.pad(kx, 1)
    kyp = jnp.pad(ky, 1)
    flux_x_l = kxp[1:-1, 1:-1] * (Tp[1:-1, 1:-1] - Tp[1:-1, :-2]) / dx
    flux_x_r = kxp[1:-1, 2:] * (Tp[1:-1, 2:] - Tp[1:-1, 1:-1]) / dx
    flux_y_u = kyp[1:-1, 1:-1] * (Tp[1:-1, 1:-1] - Tp[:-2, 1:-1]) / dy
    flux_y_d = kyp[2:, 1:-1] * (Tp[2:, 1:-1] - Tp[1:-1, 1:-1]) / dy
    div = (flux_x_r - flux_x_l) / dx + (flux_y_d - flux_y_u) / dy
    return rc * T - div


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_diffusion_matches_single_device():
    rng = np.random.default_rng(0)
    ny, nx = 32, 64  # divisible by the 4x2 mesh
    T = jnp.asarray(rng.normal(size=(ny, nx)))
    kx = jnp.asarray(rng.uniform(0.5, 2.0, size=(ny, nx)))
    ky = jnp.asarray(rng.uniform(0.5, 2.0, size=(ny, nx)))
    rc, dx, dy = 3.0, 0.1, 0.2

    want = _reference_apply(T, kx, ky, rc, dx, dy)

    mesh = make_mesh(8)
    got = jax.jit(
        lambda a, b, c: diffusion_apply_sharded(a, b, c, rc, dx, dy, mesh)
    )(T, kx, ky)

    # XLA fuses per-shard programs differently -> last-ulp reordering noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
