"""FULL-GRAPH numerical parity against the PyTorch reference.

Builds /root/reference/models/SemStereo.py (with the fake-timm MobileViTv2
backbone from tests/_reference_oracle.py), transplants its entire state_dict
into the flax tree via utils.torch_convert, runs both forwards on the same
input, and asserts the disparity / label outputs agree to fp32 tolerance —
for the stage-1 (att_weights_only) and stage-2 graphs, eval and train modes.

This retires the silent-drift risks op-level oracles cannot see (attention
token order, SSR BN placement, trilinear interp, top-k tie handling —
VERDICT r2 items Missing#2 / Weak#7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests._reference_oracle import load_reference_semstereo

from semstereo_tpu.models import SemStereo
from semstereo_tpu.utils.torch_convert import convert_semstereo_state_dict

H = W = 128  # /8 = 16x16: all attention windows fit exactly.  H/W that pad
# exactly ONE dimension are avoided deliberately: the reference's mask code
# has a `-0` slicing bug (`mask[:, -pad_b:, :]` with pad_b=0 fills the WHOLE
# mask, submodule_other.py:825-827) that silently disables masking there —
# tests/test_attention.py pins the well-defined cases directly.
MAXDISP = 64  # the only maxdisp whose D//8 survives two hourglass halvings
               # into the reference's (4,4,4)/(6,4,4) attention windows
# Disparity is compared on interior columns only: the cost volume's
# zero-masked border planes are EXACT ties, where top-24-of-32 composition is
# tie-break-defined rather than math-defined.
XMIN = 32


def _randomized_reference(att_weights_only: bool):
    """Reference model with BN running stats populated by train-mode passes
    and BN affine parameters perturbed (fresh init's scale=1/bias=0 would
    make scale<->bias mapping bugs invisible).

    The 3-D classifier outputs are scaled up so the disparity posteriors are
    PEAKED: at random init softmax over 32 planes is near-uniform, making the
    top-24 plane selection a coin flip on fp noise — peaked posteriors give
    the top-k a math-defined answer both frameworks agree on."""
    torch.manual_seed(0)
    model = load_reference_semstereo(
        maxdisp=MAXDISP, att_weights_only=att_weights_only,
        seg_if=True, stereo_if=True, num_classes=6,
    )
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d,
                              torch.nn.GroupNorm)):
                m.weight.mul_(
                    1 + 0.1 * torch.randn(m.weight.shape, generator=gen)
                )
                m.bias.add_(0.05 * torch.randn(m.bias.shape, generator=gen))
        model.classif_att_[2].weight.mul_(8.0)
        if not att_weights_only:
            model.classif[2].weight.mul_(8.0)
        model.train()
        for _ in range(2):
            li = torch.randn(1, 3, H, W, generator=gen)
            ri = torch.randn(1, 3, H, W, generator=gen)
            model(li, ri)
    model.eval()
    return model


def _flax_from_torch(model, att_weights_only: bool):
    params, stats, unused = convert_semstereo_state_dict(model.state_dict())
    assert unused == [], f"unconverted reference keys: {unused[:10]}"
    jmodel = SemStereo(
        maxdisp=MAXDISP, num_classes=6, att_weights_only=att_weights_only,
        seg_if=True, stereo_if=True,
    )
    # leaf-complete check: conversion must cover every leaf of a fresh init
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    fresh = jmodel.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    from semstereo_tpu.train.state import merge_partial_params

    merged_p, n_p = merge_partial_params(fresh["params"], params)
    n_total = len(jax.tree_util.tree_leaves(fresh["params"]))
    assert n_p == n_total, f"only {n_p}/{n_total} param leaves converted"
    merged_s, n_s = merge_partial_params(fresh["batch_stats"], stats)
    n_stats = len(jax.tree_util.tree_leaves(fresh["batch_stats"]))
    assert n_s == n_stats, f"only {n_s}/{n_stats} batch_stats leaves converted"
    return jmodel, {"params": merged_p, "batch_stats": merged_s}


def _stereo_pair(seed: int, batch: int = 1):
    """Integer-shift synthetic stereo pair: the cost volume then has GENUINE
    correlation peaks even under random weights (cosine GWC of matching
    content peaks at the true shift), so the top-k stages have a
    math-defined answer — independent random views give FLAT cost volumes
    whose top-k composition is pure fp-noise."""
    rng = np.random.default_rng(seed)
    rights, lefts = [], []
    for i in range(batch):
        r = rng.standard_normal((H, W, 3)).astype(np.float32)
        d = int(rng.integers(4, 14))
        lefts.append(np.roll(r, d, axis=1))
        rights.append(r)
    li = torch.from_numpy(np.stack(lefts).transpose(0, 3, 1, 2))
    ri = torch.from_numpy(np.stack(rights).transpose(0, 3, 1, 2))
    return li, ri


def _run_pair(att_weights_only: bool):
    model = _randomized_reference(att_weights_only)
    jmodel, variables = _flax_from_torch(model, att_weights_only)

    li, ri = _stereo_pair(7)
    with torch.no_grad():
        ref_disp, ref_label = model(li, ri)
    jl = jnp.asarray(li.numpy().transpose(0, 2, 3, 1))
    jr = jnp.asarray(ri.numpy().transpose(0, 2, 3, 1))
    out = jax.jit(lambda l, r: jmodel.apply(variables, l, r, train=False))(jl, jr)
    return (
        np.asarray(ref_disp[0]),
        np.asarray(ref_label.permute(0, 2, 3, 1)),
        np.asarray(out["disp"][0]),
        np.asarray(out["label_l"]),
        model, jmodel, variables, (li, ri), (jl, jr),
    )


def _assert_disp_close(got, ref):
    """Disparity parity with tie-flip tolerance: the top-24-of-32 plane
    selection is noise-defined wherever the random-init posteriors are flat
    over planes (fp32 reassociation decides set membership), so isolated
    pixels legitimately differ by O(1) px.  A real defect (wrong recentring,
    plane order, warp offset, scale) shifts the whole map — caught by the
    median/p95 bounds — while tie flips are bounded by the outlier fraction."""
    signed = np.asarray(got, np.float64) - np.asarray(ref, np.float64)
    diff = np.abs(signed)
    med = float(np.median(diff))
    p75 = float(np.quantile(diff, 0.75))
    frac = float((diff > 1.0).mean())
    # Bias over the tie-free bulk: pixels whose top-k set flipped (torch.sort
    # and lax.top_k break exact ties in OPPOSITE index order, so flips have a
    # one-sided direction) are excluded; on the remaining >90% any systematic
    # defect (recentring, plane order, warp offset, scale) shows up whole.
    bulk = diff < 0.5
    bias = float(signed[bulk].mean())
    assert med < 0.01, f"median |disp diff| {med:.4f} px"
    assert p75 < 0.1, f"p75 |disp diff| {p75:.4f} px"
    assert abs(bias) < 0.01, f"bulk mean signed disp diff {bias:.4f} px"
    assert frac < 0.08, f"{frac:.3%} of pixels differ by >1 px"


@pytest.mark.parametrize("att_weights_only", [True, False])
def test_full_graph_eval_parity(att_weights_only):
    ref_disp, ref_label, got_disp, got_label, *_ = _run_pair(att_weights_only)
    # fp32 reassociation noise through ~40 conv layers reaches ~1e-3 on
    # logits of magnitude ~0.1; any real mapping defect (swapped scale/bias,
    # permuted tokens) is orders of magnitude larger.
    np.testing.assert_allclose(got_label, ref_label, rtol=1e-3, atol=2e-3)
    _assert_disp_close(got_disp[:, :, XMIN:], ref_disp[:, :, XMIN:])


def test_full_graph_train_parity():
    """Train-mode forward (batch-stat BN) on the stage-2 graph: all four
    disparity outputs and both label maps must match, pinning batch-stat
    semantics and the train-only output tuple."""
    model = _randomized_reference(att_weights_only=False)
    jmodel, variables = _flax_from_torch(model, att_weights_only=False)

    li, ri = _stereo_pair(11, batch=2)
    model.train()
    with torch.no_grad():
        ref_disps, ref_label, ref_label_r = model(li, ri)
    jl = jnp.asarray(li.numpy().transpose(0, 2, 3, 1))
    jr = jnp.asarray(ri.numpy().transpose(0, 2, 3, 1))
    out, _ = jax.jit(
        lambda l, r: jmodel.apply(
            variables, l, r, train=True, mutable=["batch_stats"]
        )
    )(jl, jr)
    assert len(out["disp"]) == len(ref_disps) == 4
    for i, (got, ref) in enumerate(zip(out["disp"], ref_disps)):
        ref = np.asarray(ref.squeeze(1) if ref.dim() == 4 else ref)
        xmin = XMIN if ref.shape[-1] == W else XMIN // 4
        _assert_disp_close(np.asarray(got)[:, :, xmin:], ref[:, :, xmin:])
    np.testing.assert_allclose(
        np.asarray(out["label_l"]),
        np.asarray(ref_label.permute(0, 2, 3, 1)), rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["label_r"]),
        np.asarray(ref_label_r.permute(0, 2, 3, 1)), rtol=1e-3, atol=2e-3,
    )
