"""Tests for the 3-D conv kernels that ship on TPU, run in Pallas
interpreter mode on CPU (compiled parity on real TPU lives in
benchmarks/results_r4.json).

Covers every branch of conv_nd's TPU dispatch (ops/convops.py):
  * conv3d_wl stride-1 and stride-2 forward, at the channel/width structure
    of the real model shapes (C=32/64, F=32/64 — classif_att conv0,
    concat_stem, hourglass conv1/conv2; reference SemStereo.py:110-133),
  * conv3d_wl custom VJP (dx and dw, both strides),
  * the fused-affine inference path (conv3d_wl_affine),
  * _conv3d_cout1_dfold (the Cout=1 classifier head, D folded into
    channels; reference SemStereo.py:171-177) — pure XLA, tested directly.

Interpret-mode shapes keep D/H tiny but honour the kernel's lane contract
(s1 needs W % 128 == 0; s2 needs (W/2) % 128 == 0), so the grid/DMA logic
runs exactly as on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from semstereo_tpu.ops.convops import _conv3d_cout1_dfold
from semstereo_tpu.ops.pallas import conv3d_wl as wl


def _ref(x, k, stride):
    return lax.conv_general_dilated(
        x, k, (stride,) * 3, [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


# (x_shape, F, stride) — scaled-depth versions of the shapes conv_nd
# dispatches to Pallas in the flagship 1024x1024 maxdisp-64 graph.
MODEL_SHAPES = [
    ((1, 4, 8, 128, 32), 32, 1),   # classif/classif_att conv0 (/8 & /4)
    ((1, 4, 8, 128, 64), 32, 1),   # concat_stem 64->32
    ((1, 4, 4, 128, 64), 64, 1),   # hourglass conv2 64->64
    ((1, 4, 8, 256, 32), 64, 2),   # hourglass conv1 32->64 s2
]


@pytest.mark.parametrize("xshape,f,stride", MODEL_SHAPES)
def test_forward_matches_xla(rng, xshape, f, stride):
    c = xshape[-1]
    x = jnp.asarray(rng.standard_normal(xshape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, f)) * 0.1, jnp.float32)
    assert wl.supported(xshape, k.shape, stride), "shape must hit the kernel"
    ref = _ref(x, k, stride)
    with pltpu.force_tpu_interpret_mode():
        got = wl.conv3d_wl(x, k, stride, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,xshape,f", [(1, (1, 2, 8, 128, 32), 32),
                                             (2, (1, 4, 8, 256, 32), 64)])
def test_relu_fused(rng, stride, xshape, f):
    c = xshape[-1]
    x = jnp.asarray(rng.standard_normal(xshape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, f)) * 0.1, jnp.float32)
    ref = jnp.maximum(_ref(x, k, stride), 0.0)
    with pltpu.force_tpu_interpret_mode():
        got = wl.conv3d_wl(x, k, stride, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_affine_fused(rng):
    """BN-folded inference path: y = conv(x) * scale + bias, then ReLU."""
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 128, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (32,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    ref = jnp.maximum(_ref(x, k, 1) * scale + bias, 0.0)
    with pltpu.force_tpu_interpret_mode():
        got = wl.conv3d_wl_affine(x, k, scale, bias, 1, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,xshape,f", [(1, (1, 2, 4, 128, 32), 32),
                                             (2, (1, 2, 4, 256, 32), 64)])
def test_vjp_matches_xla(rng, stride, xshape, f):
    """Custom VJP: dx (itself a wl conv at s1 / phase-decomposed transpose at
    s2) and dw (27 dense contractions) vs XLA autodiff."""
    c = xshape[-1]
    x = jnp.asarray(rng.standard_normal(xshape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, f)) * 0.1, jnp.float32)

    def loss_p(x, k):
        return jnp.sum(wl.conv3d_wl(x, k, stride, False) ** 2)

    def loss_r(x, k):
        return jnp.sum(_ref(x, k, stride) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gx_p, gk_p = jax.grad(loss_p, (0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("stride,xshape,f", [(1, (1, 2, 4, 128, 32), 32)])
def test_vjp_relu(rng, stride, xshape, f):
    """ReLU-fused VJP masks gy by y > 0."""
    c = xshape[-1]
    x = jnp.asarray(rng.standard_normal(xshape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, f)) * 0.1, jnp.float32)

    def loss_p(x, k):
        return jnp.sum(wl.conv3d_wl(x, k, stride, True) ** 2)

    def loss_r(x, k):
        return jnp.sum(jnp.maximum(_ref(x, k, stride), 0.0) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gx_p, gk_p = jax.grad(loss_p, (0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("d", [4, 16, 24])
def test_dfold_classifier_head(rng, d):
    """Cout=1 3x3x3 s1 conv as a D-folded 2-D conv, at the model's real
    depths (stage-1 D=16, stage-2 top-k D=24)."""
    x = jnp.asarray(rng.standard_normal((2, d, 8, 16, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 1)) * 0.1, jnp.float32)
    ref = _ref(x, k, 1)
    got = _conv3d_cout1_dfold(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_dfold_gradients(rng):
    """dfold is plain XLA, so autodiff through it must match the direct conv."""
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 1)) * 0.1, jnp.float32)

    def loss_p(x, k):
        return jnp.sum(_conv3d_cout1_dfold(x, k) ** 2)

    def loss_r(x, k):
        return jnp.sum(_ref(x, k, 1) ** 2)

    gx_p, gk_p = jax.grad(loss_p, (0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r), rtol=1e-4, atol=1e-4)


def test_supported_gate_matches_model_shapes():
    """The dispatch gate must accept the flagship shapes it is supposed to
    accelerate and reject the ones that fall back to XLA (ow % 128 etc.)."""
    k = lambda c, f: (3, 3, 3, c, f)
    # flagship 1024x1024 maxdisp-64 shapes that SHOULD hit Pallas
    assert wl.supported((1, 16, 128, 128, 32), k(32, 32), 1)   # classif_att conv0
    assert wl.supported((1, 24, 256, 256, 64), k(64, 32), 1)   # concat_stem
    assert wl.supported((1, 12, 128, 128, 64), k(64, 64), 1)   # hourglass conv2
    assert wl.supported((1, 24, 256, 256, 32), k(32, 64), 2)   # hourglass conv1
    # shapes that must fall back (output width not lane-aligned)
    assert not wl.supported((1, 16, 128, 128, 32), k(32, 64), 2)  # ow=64
    assert not wl.supported((1, 8, 64, 64, 64), k(64, 64), 1)     # W=64
    assert not wl.supported((1, 12, 128, 128, 64), k(64, 128), 2)  # ow=64


@pytest.mark.parametrize("stride", [1, 2])
def test_kdsplit_matches_xla(rng, monkeypatch, stride):
    """Opt-in kd-plane decomposition (SEMSTEREO_CONV3D_KDSPLIT=1): 3 batched
    2-D convs summed must equal the direct 3-D conv."""
    from semstereo_tpu.ops.convops import _conv3d_kdsplit

    x = jnp.asarray(rng.standard_normal((2, 6, 8, 10, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1, jnp.float32)
    ref = _ref(x, k, stride)
    got = _conv3d_kdsplit(x, k, stride, [(1, 1), (1, 1)], None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c,f,d", [(16, 8, 8), (8, 16, 4), (16, 16, 12)])
def test_dtile_matches_xla(rng, c, f, d):
    """Opt-in D-tiled dense fold (SEMSTEREO_CONV3D_DTILE=1): tiles of 4
    output planes with halo folded into a 2-D conv must equal the direct
    3-D conv."""
    from semstereo_tpu.ops.convops import _conv3d_dtile

    x = jnp.asarray(rng.standard_normal((2, d, 6, 10, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, f)) * 0.1, jnp.float32)
    ref = _ref(x, k, 1)
    got = _conv3d_dtile(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dt,shape", [(2, (2, 8, 8, 10, 16)), (4, (1, 16, 6, 8, 8))])
def test_dtile_s2_matches_xla(rng, dt, shape):
    """Opt-in stride-2 D-tiled dense fold (SEMSTEREO_CONV3D_S2FOLD=<dt>):
    windows of 2dt+1 input planes folded into a stride-2 2-D conv must equal
    the direct stride-2 3-D conv."""
    from semstereo_tpu.ops.convops import _conv3d_dtile_s2

    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, 12)) * 0.1, jnp.float32)
    ref = _ref(x, k, 2)
    got = _conv3d_dtile_s2(x, k, dt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_dtile_s2_gradients(rng):
    """s2fold is plain XLA, so autodiff through it must match the direct conv."""
    from semstereo_tpu.ops.convops import _conv3d_dtile_s2

    x = jnp.asarray(rng.standard_normal((1, 8, 6, 6, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 4)) * 0.1, jnp.float32)

    def loss_fold(x, k):
        return jnp.sum(_conv3d_dtile_s2(x, k, 2) ** 2)

    def loss_ref(x, k):
        return jnp.sum(_ref(x, k, 2) ** 2)

    gx1, gk1 = jax.grad(loss_fold, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("d,c,f", [(8, 16, 8), (4, 8, 8), (24, 8, 4)])
def test_classifier_head_fused_matches_modular(rng, d, c, f):
    """Fused folded-domain classifier chain == conv0 + affine + ReLU + conv1
    run as plain 3-D convs (the Classifier3D eval path)."""
    from semstereo_tpu.ops.convops import classifier_head_fused

    x = jnp.asarray(rng.standard_normal((2, d, 6, 10, c)), jnp.float32)
    k0 = jnp.asarray(rng.standard_normal((3, 3, 3, c, f)) * 0.1, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, f, 1)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)

    y = _ref(x, k0, 1)
    y = jax.nn.relu(y * s + b)
    want = _ref(y, k1, 1)
    got = classifier_head_fused(x, k0, s, b, k1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("d,c,f", [(8, 16, 8), (24, 8, 4)])
def test_classifier_head_fused_v2_matches_modular(rng, d, c, f):
    """v2 (composed unfold/refold transpose, truncated-band conv1 kernel)
    == conv0 + affine + ReLU + conv1 as plain 3-D convs."""
    from semstereo_tpu.ops.convops import classifier_head_fused_v2

    x = jnp.asarray(rng.standard_normal((2, d, 6, 10, c)), jnp.float32)
    k0 = jnp.asarray(rng.standard_normal((3, 3, 3, c, f)) * 0.1, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, f, 1)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)

    y = _ref(x, k0, 1)
    y = jax.nn.relu(y * s + b)
    want = _ref(y, k1, 1)
    got = classifier_head_fused_v2(x, k0, s, b, k1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_folded_stem_conv_matches_modular(rng):
    """folded_stem_conv (stem input built directly from warp outputs) ==
    att*concat(tl,wr) -> direct 3-D conv -> affine -> ReLU."""
    from semstereo_tpu.ops.convops import folded_stem_conv

    b, d, h, w, c, f = 2, 8, 6, 10, 8, 8
    att = jnp.asarray(rng.standard_normal((b, d, h, w)), jnp.float32)
    tl = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
    wr = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 2 * c, f)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
    bb = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)

    vol = att[..., None] * jnp.concatenate([tl, wr], axis=-1)
    want = jax.nn.relu(_ref(vol, k, 1) * s + bb)
    got = folded_stem_conv(att, tl, wr, k, s, bb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
