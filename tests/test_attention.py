"""Windowed 3-D MHSA: masked padding semantics.

The reference attention_block (submodule_other.py:790-837) pads H/W to window
multiples and blocks pad<->real attention with a -1000 additive bias; our
version extends the same scheme to the depth axis for reduced-maxdisp
configs.  With D smaller than the window depth, every real token still sees
exactly the same set of real tokens as with a depth-matched window, so the
outputs must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from semstereo_tpu.nn.attention import WindowedAttention3D


def test_depth_padding_matches_exact_window():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 2, 5, 7, 32))  # D=2 < window depth 4

    pad_mod = WindowedAttention3D(num_heads=4, window=(4, 4, 4))
    exact_mod = WindowedAttention3D(num_heads=4, window=(2, 4, 4))
    variables = pad_mod.init(jax.random.PRNGKey(1), x)

    out_pad = pad_mod.apply(variables, x)
    out_exact = exact_mod.apply(variables, x)
    assert out_pad.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(out_exact), rtol=1e-5, atol=1e-5
    )


def test_no_padding_path_unchanged():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 4, 8, 8, 16))
    mod = WindowedAttention3D(num_heads=4, window=(4, 4, 4))
    variables = mod.init(jax.random.PRNGKey(3), x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
