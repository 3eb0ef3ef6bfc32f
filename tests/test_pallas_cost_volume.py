"""Pallas cost-volume kernel vs the XLA reference implementation, run in
interpreter mode so it executes on the CPU test mesh.  (The same comparison
runs compiled on real TPU hardware in bench/roofline harnesses.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from semstereo_tpu.ops.cost_volume import gwc_volume_norm_xla
from semstereo_tpu.ops.pallas.cost_volume_kernel import gwc_volume_norm_pallas


@pytest.mark.parametrize("symmetric", [True, False])
def test_pallas_matches_xla_interpret(rng, symmetric):
    b, h, w, c = 1, 4, 16, 32
    groups, max_shift = 4, 4
    left = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ref = gwc_volume_norm_xla(left, right, max_shift, groups, symmetric)
    with pltpu.force_tpu_interpret_mode():
        out = gwc_volume_norm_pallas(left, right, max_shift, groups, symmetric)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_gradient_matches_xla(rng):
    b, h, w, c = 1, 2, 16, 16
    groups, max_shift = 2, 2
    left = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    right = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    def f_pallas(l, r):
        return jnp.sum(gwc_volume_norm_pallas(l, r, max_shift, groups, True) ** 2)

    def f_xla(l, r):
        return jnp.sum(gwc_volume_norm_xla(l, r, max_shift, groups, True) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_pallas, (0, 1))(left, right)
    gx = jax.grad(f_xla, (0, 1))(left, right)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
