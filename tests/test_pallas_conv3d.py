"""Pallas stride-2 3x3x3 conv kernel vs lax.conv_general_dilated, in
interpreter mode on the CPU test mesh (compiled parity + the roofline run on
real TPU live in benchmarks/)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from semstereo_tpu.ops.pallas.conv3d_kernel import conv3d_s2_pallas


def _ref(x, k):
    return lax.conv_general_dilated(
        x, k, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def test_forward_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 16, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 16)) * 0.1, jnp.float32)
    ref = _ref(x, k)
    with pltpu.force_tpu_interpret_mode():
        got = conv3d_s2_pallas(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gradients_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 8)) * 0.1, jnp.float32)

    def loss_p(x, k):
        return jnp.sum(conv3d_s2_pallas(x, k) ** 2)

    def loss_r(x, k):
        return jnp.sum(_ref(x, k) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gx_p, gk_p = jax.grad(loss_p, (0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r), rtol=1e-4, atol=1e-4)
