"""Graph/shape tests: every mode combination of (att_weights_only, seg_if,
stereo_if) x (train/eval) returns the documented structure
(reference forward contract: /root/reference/models/SemStereo.py:326-346)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semstereo_tpu.models import SemStereo, SemStereoWHU, __models__

H = W = 64
B = 1


def build(model_cls, maxdisp=64, **kw):
    m = model_cls(maxdisp=maxdisp, topk=24, **kw)
    left = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.float32)
    right = jnp.asarray(np.random.default_rng(1).standard_normal((B, H, W, 3)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), left, right, train=False)
    return m, variables, left, right


@pytest.fixture(scope="module")
def full_model():
    return build(SemStereo)


def test_train_full_mode(full_model):
    m, variables, left, right = full_model
    out, state = m.apply(
        variables, left, right, train=True, mutable=["batch_stats"]
    )
    assert [d.shape for d in out["disp"]] == [
        (B, H, W),
        (B, H // 4, W // 4),
        (B, H, W),
        (B, H // 4, W // 4),
    ]
    assert out["label_l"].shape == (B, H, W, 6)
    assert out["label_r"].shape == (B, H, W, 6)
    assert "batch_stats" in state


def test_eval_full_mode(full_model):
    m, variables, left, right = full_model
    out = m.apply(variables, left, right, train=False)
    assert [d.shape for d in out["disp"]] == [(B, H, W)]
    assert out["label_l"].shape == (B, H, W, 6)
    assert np.all(np.isfinite(np.asarray(out["disp"][0])))


def test_fused_views_matches_two_pass_eval(full_model):
    """The optional view-stacked eval front end (fuse_views=True) must equal
    the default two-pass path to float tolerance (BN on running stats)."""
    m, variables, left, right = full_model
    fused = m.clone(fuse_views=True).apply(variables, left, right, train=False)
    twopass = m.apply(variables, left, right, train=False)
    np.testing.assert_allclose(
        np.asarray(fused["disp"][0]), np.asarray(twopass["disp"][0]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fused["label_l"]), np.asarray(twopass["label_l"]),
        rtol=1e-4, atol=1e-4,
    )


def test_att_weights_only_mode():
    m, variables, left, right = build(SemStereo, att_weights_only=True)
    out, _ = m.apply(variables, left, right, train=True, mutable=["batch_stats"])
    assert [d.shape for d in out["disp"]] == [(B, H, W), (B, H // 4, W // 4)]
    out = m.apply(variables, left, right, train=False)
    assert [d.shape for d in out["disp"]] == [(B, H, W)]


def test_seg_only_mode():
    m, variables, left, right = build(SemStereo, stereo_if=False)
    out = m.apply(variables, left, right, train=False)
    assert "disp" not in out
    assert out["label_l"].shape == (B, H, W, 6)


def test_whu_positive_range():
    # WHU recipe: maxdisp=128, positive [0, maxdisp) (reference main_whu.py:51)
    m, variables, left, right = build(SemStereoWHU, maxdisp=128)
    out = m.apply(variables, left, right, train=False)
    assert [d.shape for d in out["disp"]] == [(B, H, W)]
    assert np.all(np.isfinite(np.asarray(out["disp"][0])))


def test_registry_keys():
    assert set(__models__) == {"SemStereo", "SemStereo_WHU"}


def test_stage1_params_subset_of_stage2():
    """Stage-1 (attention-only) parameter tree must be a subset of stage-2's,
    so the partial-restore warm start works (reference main_us3d.py:116-123)."""
    m1, v1, left, right = build(SemStereo, att_weights_only=True)
    m2, v2, *_ = build(SemStereo, att_weights_only=False)
    flat1 = jax.tree_util.tree_leaves_with_path(v1["params"])
    flat2 = dict(jax.tree_util.tree_leaves_with_path(v2["params"]))
    missing = [p for p, x in flat1 if p not in flat2 or flat2[p].shape != x.shape]
    assert not missing, missing
