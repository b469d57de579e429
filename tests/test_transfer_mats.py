"""Matrix forms of the MG transfers (solvers/transfer_mats.py) vs the jnp
stencil transfers in solvers/mg.py — element-exact on random fields."""
import jax.numpy as jnp
import numpy as np
import pytest

from pylamp_tpu.core.bc import VelocityBCs
from pylamp_tpu.solvers.mg import (
    prolong_vx,
    prolong_vy,
    restrict_vx,
    restrict_vy,
)
from pylamp_tpu.solvers.transfer_mats import transfer_mats


@pytest.mark.parametrize("bc", ["free_slip", "no_slip"])
@pytest.mark.parametrize("ny,nx", [(16, 24), (32, 32)])
def test_transfer_mats_match_jnp(bc, ny, nx):
    bcs = VelocityBCs(top=bc, bottom=bc, left=bc, right=bc)
    mats = transfer_mats(ny, nx, bcs, dtype=np.float64)
    rng = np.random.default_rng(5)

    fvx = jnp.asarray(rng.normal(size=(ny, nx + 1)))
    ref = np.asarray(restrict_vx(fvx, bcs))
    Ay, Ax = mats["rvx"]
    np.testing.assert_allclose(Ay @ np.asarray(fvx) @ Ax.T, ref, atol=1e-13)

    cvx = jnp.asarray(rng.normal(size=(ny // 2, nx // 2 + 1)))
    ref = np.asarray(prolong_vx(cvx, bcs))
    Py, Px = mats["pvx"]
    np.testing.assert_allclose(Py @ np.asarray(cvx) @ Px.T, ref, atol=1e-13)

    fvy = jnp.asarray(rng.normal(size=(ny + 1, nx)))
    ref = np.asarray(restrict_vy(fvy, bcs))
    By, Bx = mats["rvy"]
    np.testing.assert_allclose(By @ np.asarray(fvy) @ Bx.T, ref, atol=1e-13)

    cvy = jnp.asarray(rng.normal(size=(ny // 2 + 1, nx // 2)))
    ref = np.asarray(prolong_vy(cvy, bcs))
    Qy, Qx = mats["pvy"]
    np.testing.assert_allclose(Qy @ np.asarray(cvy) @ Qx.T, ref, atol=1e-13)
