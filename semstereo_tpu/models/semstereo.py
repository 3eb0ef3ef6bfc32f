"""SemStereo: semantic-constrained stereo matching network, TPU-native.

Fresh JAX re-design of the reference graph
(/root/reference/models/SemStereo.py:184-346 and the WHU twin
models/SemStereo_WHU.py, which differs only in positive-disparity semantics:
attention volume interpolated to maxdisp//4 planes and un-recentred top-k
samples — lines 279/305).  One class covers both via ``symmetric``.

Layouts: images [B, H, W, C]; cost volumes [B, D, H, W, C]; hypothesis maps
[B, K, H, W].  Mode flags (att_weights_only / seg_if / stereo_if) are static
module attributes, so each configuration traces to its own fused XLA program.

Outputs (dict):
  train, stage-1:  disp = (pred_att_up*4, pred_att*4)
  train, stage-2:  disp = (pred_up*4, pred*4, pred_att_up*4, pred_att*4)
  eval:            disp = (pred_up*4,)  [or pred_att_up in stage 1]
  seg_if adds      label_l, label_r : [B, H, W, num_classes] logits
(The reference requires seg_if=True whenever stereo_if=True — its SSR
upsampler consumes pred_label unconditionally, SemStereo.py:311.)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from semstereo_tpu.nn import (
    BasicConv,
    ChannelAtt,
    Classifier3D,
    Conv2x,
    ConvBn,
    Hourglass3D,
    MobileViTv2Backbone,
    SegmentHead,
    SSRUpsample,
    TorchConv,
    TorchConvTranspose,
)
from semstereo_tpu.ops import (
    disparity_regression,
    disparity_variance,
    gwc_volume_norm,
    propagate5,
    propagate5_volume,
    regression_topk,
    resize_trilinear,
    topk_planes,
    warp_strength,
    warp_with_left,
)

# Fused-pyramid channel plan (reference SemStereo.py:196-197).
CHANS = (128, 256, 512, 768, 512)
CHANS2 = (64, 128, 256, 384, 256)


class FeatUp(nn.Module):
    """Top-down FPN of deconv Conv2x stages (reference SemStereo.py:59-86).

    Operates on ONE pyramid; the model shares it across views — called twice
    (train) or once on a view-stacked batch (eval), with identical params."""

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x2, x4, x8, x16, x32 = feats
        x16 = Conv2x(384, deconv=True, name="deconv32_16")(x32, x16, train)
        x8 = Conv2x(256, deconv=True, name="deconv16_8")(x16, x8, train)
        x4 = Conv2x(128, deconv=True, name="deconv8_4")(x8, x4, train)
        x2 = Conv2x(64, deconv=True, name="deconv4_2")(x4, x2, train)
        return [x2, x4, x8, x16, x32]


def _remat_components(spec) -> frozenset:
    """Parse the remat policy (see SemStereo.remat docstring)."""
    if spec in (False, None, "", "none"):
        return frozenset()
    if spec is True or spec == "full":
        return frozenset({"backbone", "hourglass"})
    comps = frozenset(s.strip() for s in str(spec).split(",") if s.strip())
    unknown = comps - {"backbone", "featup", "hourglass", "concat", "spx"}
    assert not unknown, f"unknown remat components: {sorted(unknown)}"
    return comps


class SemStereo(nn.Module):
    maxdisp: int = 64
    num_classes: int = 6
    att_weights_only: bool = False
    seg_if: bool = True
    stereo_if: bool = True
    symmetric: bool = True  # True: US3D [-maxdisp, maxdisp); False: WHU [0, maxdisp)
    topk: int = 24
    refine_topk: int = 2
    cost_volume_impl: str = "auto"
    # shifts (fused static-shift accumulation; +0.6 pairs/s over the one-hot
    # einsum at the flagship shape, benchmarks/results_r4.json) | onehot
    # (MXU banded contraction) | gather (take_along_axis oracle)
    warp_impl: str = "shifts"
    # Attention windows at the two hourglass bottlenecks (reference: (4,4,4)
    # and (6,4,4), SemStereo.py:122,161).  The bottleneck depth D/4 must be a
    # multiple of the window depth; override for reduced-maxdisp configs.
    att_window1: tuple[int, int, int] = (4, 4, 4)
    att_window2: tuple[int, int, int] = (6, 4, 4)
    # When True, annotate cost volumes with a PartitionSpec sharding their
    # disparity-plane axis over the mesh's 'disp' axis (tensor parallelism for
    # the volume pipeline; requires an active jax.sharding.use_mesh context).
    shard_disp: bool = False
    # When True, annotate cost volumes with a height-tile sharding over the
    # mesh's 'space' axis (spatial parallelism; GSPMD adds conv halo exchange).
    shard_spatial: bool = False
    # Batch the two views through the shared front end (backbone/FeatUp/chal)
    # in eval mode.  None => automatic, which is the TWO-PASS path: stacking
    # the views halves kernel count but the per-level concat/slice boundaries
    # break XLA's conv layout propagation and fusions — measured 13.79
    # (fused) vs 15.32 pairs/s (two-pass) at the flagship eval shape
    # (benchmarks/results_r4.json).  True forces fusing (it is numerically
    # identical: eval BN uses running stats).
    fuse_views: bool | None = None
    # Rematerialization policy for the backward pass (SURVEY.md section 7
    # 'Memory').  Accepts:
    #   False/"none"      — store everything
    #   True/"full"       — remat backbone + both 3-D hourglasses (the r4
    #                       all-or-nothing lever: ~1/3 extra FLOPs)
    #   comma-set string  — any of {backbone, featup, hourglass, concat,
    #                       spx}, e.g. "featup" remats ONLY the FPN whose
    #                       half-res activations (260 MB x4 copies at b2,
    #                       results_r4.json:train_step_b4) OOM'd batch 2 —
    #                       cheap FLOPs, big memory (VERDICT r4 next #3).
    remat: bool | str = False

    def _constrain_disp(self, vol):
        """Sharding constraint on a [B, D, H, W, ...] cost volume: disparity
        planes over ``disp`` and/or height tiles over ``space``."""
        if not (self.shard_disp or self.shard_spatial):
            return vol
        from jax.sharding import PartitionSpec as P

        from semstereo_tpu.parallel import DATA_AXIS, DISP_AXIS, SPATIAL_AXIS

        spec = P(
            DATA_AXIS,
            DISP_AXIS if self.shard_disp else None,
            SPATIAL_AXIS if self.shard_spatial else None,
            *([None] * (vol.ndim - 3)),
        )
        return jax.lax.with_sharding_constraint(vol, spec)

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        assert self.seg_if or not self.stereo_if, (
            "stereo_if requires seg_if: SSR upsampling consumes pred_label "
            "(reference SemStereo.py:311)"
        )
        comps = _remat_components(self.remat)
        backbone_cls = (
            nn.remat(MobileViTv2Backbone, static_argnums=(2,))
            if "backbone" in comps
            else MobileViTv2Backbone
        )
        hourglass_cls = (
            nn.remat(Hourglass3D, static_argnums=(2,))
            if "hourglass" in comps
            else Hourglass3D
        )
        featup_cls = (
            nn.remat(FeatUp, static_argnums=(2,)) if "featup" in comps else FeatUp
        )
        backbone = backbone_cls(name="feature")
        featup = featup_cls(name="feature_up")
        b = left.shape[0]
        # Eval: batch both views through the shared front end — BN uses
        # running stats so results are identical to two passes, but kernel
        # count halves and every conv runs at 2x batch (better MXU shapes at
        # B=1 serving).  Train keeps two passes: reference DataParallel
        # computes BN batch stats per feature() call (SURVEY.md section 2.6).
        fuse_views = bool(self.fuse_views) and not train
        if fuse_views:
            feats = featup(backbone(jnp.concatenate([left, right], axis=0), train), train)
            feat_l = [f[:b] for f in feats]
            feat_r = [f[b:] for f in feats]
        else:
            feats = None
            feat_l = featup(backbone(left, train), train)
            feat_r = featup(backbone(right, train), train)

        out: dict[str, Any] = {}
        if self.seg_if:
            head_l = SegmentHead(CHANS[0] // 4, self.num_classes, 2, name="head_l")
            head_r = SegmentHead(CHANS[0] // 4, self.num_classes, 2, name="head_r")
            pred_label = head_l(feat_l[0], train)
            out["label_l"] = pred_label
            out["label_r"] = head_r(feat_r[0], train)

        if not self.stereo_if:
            return out

        # --- channel reduction (chal_1/chal_2 shared across views) ---
        chal = [
            ConvBn(CHANS2[i], 1, padding=0, use_bias=True, name=f"chal_{i}")
            for i in range(5)
        ]
        if fuse_views:
            # levels 1/2 feed both views: reduce on the stacked batch
            c1 = chal[1](feats[1], train)
            c2 = chal[2](feats[2], train)
            fl = [
                chal[0](feat_l[0], train), c1[:b], c2[:b],
                chal[3](feat_l[3], train), chal[4](feat_l[4], train),
            ]
            fr1, fr2 = c1[b:], c2[b:]
        else:
            fl = [chal[i](feat_l[i], train) for i in range(5)]
            fr1 = chal[1](feat_r[1], train)
            fr2 = chal[2](feat_r[2], train)

        # --- superpixel weight chain -> full-res spx weights ---
        spx_cls = (
            nn.remat(Conv2x, static_argnums=(3,)) if "spx" in comps else Conv2x
        )
        xspx = spx_cls(CHANS2[3], deconv=True, name="spx32_16")(fl[4], fl[3], train)
        xspx = spx_cls(CHANS2[2], deconv=True, name="spx16_8")(xspx, fl[2], train)
        xspx = spx_cls(CHANS2[1], deconv=True, name="spx8_4")(xspx, fl[1], train)
        xspx = spx_cls(CHANS2[0], deconv=True, name="spx4_2")(xspx, fl[0], train)
        spx_pred = TorchConvTranspose(
            self.num_classes, 4, 2, 1, use_bias=True, name="spx2"
        )(xspx, phase=train)

        # --- stage 1: attention-weight (coarse) cost volume at /8 ---
        groups = CHANS2[2] // 8  # 32
        d8 = self.maxdisp // 8 * (2 if self.symmetric else 1)
        assert d8 % 4 == 0, (
            f"maxdisp={self.maxdisp} gives a {d8}-plane /8 attention volume; "
            "the hourglass needs D divisible by 4 (two stride-2 halvings) — "
            f"minimum maxdisp is {16 if self.symmetric else 32}"
        )
        corr = gwc_volume_norm(
            fl[2], fr2, self.maxdisp // 8, groups,
            symmetric=self.symmetric, impl=self.cost_volume_impl,
        )  # [B, D8, H8, W8, G]
        corr = self._constrain_disp(corr)
        corr = TorchConv(
            groups, (1, 3, 3), padding=(0, 1, 1), dims=3, groups=groups,
            use_bias=False, name="patch",
        )(corr)
        cost_att = ChannelAtt(groups, name="corr_feature_att_8")(corr, fl[2], train)
        cost_att = hourglass_cls(32, self.att_window1, name="hourglass_att")(cost_att, train)
        cost_att = Classifier3D(32, name="classif_att")(cost_att, train)

        d4 = self.maxdisp // 4 * (2 if self.symmetric else 1)
        h4, w4 = left.shape[1] // 4, left.shape[2] // 4
        att_weights = resize_trilinear(cost_att, (d4, h4, w4))[..., 0]  # [B, D4, H4, W4]

        att_prob_full = jax.nn.softmax(att_weights, axis=1)
        pred_att = disparity_regression(att_prob_full, self.symmetric)

        # confidence from soft-argmin variance, learned gamma/beta
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        beta = self.param("beta", nn.initializers.constant(2.0), (1,))
        var = disparity_variance(att_prob_full, pred_att, self.symmetric)
        conf = jax.nn.sigmoid(beta[0] + gamma[0] * var)  # [B, H4, W4]

        conf_samples = propagate5(conf)  # [B, 5, H4, W4]
        disp_samples = propagate5(pred_att)

        # disp at /4 is bounded by the regression range -> banded warp.
        # Symmetric (US3D): d in [-d4/2, d4/2) -> source offsets in [-d4/2, d4/2].
        # Positive-only (WHU): d in [0, d4) -> offsets only in [-d4, 0]; the
        # asymmetric band halves the warp contraction width.
        if self.symmetric:
            min_off, max_off = -(d4 // 2), d4 // 2
        else:
            min_off, max_off = -d4, 0
        # correlate-then-lerp form of mean_c(left * warp(right)) — identical
        # math, ~5x cheaper than the fused warp+reduce (ops/warp.py)
        strength = warp_strength(
            fl[1], fr1, disp_samples, max_off, min_off
        )  # [B, 5, H4, W4]
        strength = jax.nn.softmax(strength * conf_samples, axis=1)

        att_weights = propagate5_volume(att_weights)  # [B, 5, D4, H4, W4]
        att_weights = jnp.sum(att_weights * strength[:, :, None], axis=1)

        # Clamp top-k to the available planes: the reference hardcodes k=24
        # against d4=32 (SemStereo.py:301); reduced-maxdisp configs have fewer.
        k = min(self.topk, d4)
        att_topk, att_raw, samples = topk_planes(att_weights, k, self.symmetric)
        att_prob = jax.nn.softmax(att_raw, axis=1)
        pred_att = jnp.sum(att_prob * samples, axis=1)  # [B, H4, W4]
        ssr = SSRUpsample(self.num_classes, name="ssr_upsample")
        pred_att_up = ssr(pred_att[..., None], spx_pred, pred_label, train)

        if not self.att_weights_only:
            # --- stage 2: top-k-sampled concat volume refinement at /4 ---
            concat_cls = (
                nn.remat(_ConcatFeature, static_argnums=(2,))
                if "concat" in comps
                else _ConcatFeature
            )
            concat_feature = concat_cls(name="concat_feature")
            if fuse_views:
                cc = concat_feature(jnp.concatenate([fl[1], fr1], axis=0), train)
                lc, rc = cc[:b], cc[b:]
            else:
                lc = concat_feature(fl[1], train)
                rc = concat_feature(fr1, train)
            warped_rc, tiled_lc = warp_with_left(
                lc, rc, samples, impl=self.warp_impl,
                max_offset=max_off, min_offset=min_off,
            )
            stem = BasicConv(CHANS2[1] // 4, 3, 1, 1, dims=3, name="concat_stem")
            import os

            if (
                not train
                and k % 4 == 0
                and not (self.shard_disp or self.shard_spatial)
                and os.environ.get("SEMSTEREO_FOLDED_STEM", "1") != "0"
            ):
                # Eval default (+1.2% whole-model, interleaved x2,
                # results_r5.json): build the stem's D-tiled input directly
                # from the warp outputs instead of materializing the
                # [B, K, H, W, 2C] volume and window-stacking it — the
                # graph's largest copy pair (ops/convops.py
                # folded_stem_conv).  Same params (dummy materialization);
                # SEMSTEREO_FOLDED_STEM=0 restores the unfolded path.
                stem(jnp.zeros((1, 4, 4, 4, 2 * tiled_lc.shape[-1]),
                               tiled_lc.dtype), False)
                p0 = self.get_variable("params", "concat_stem")
                bs0 = self.get_variable("batch_stats", "concat_stem")
                var = bs0["bn"]["var"].astype(jnp.float32)
                mean = bs0["bn"]["mean"].astype(jnp.float32)
                s = p0["bn"]["scale"].astype(jnp.float32) / jnp.sqrt(var + 1e-5)
                bb = p0["bn"]["bias"].astype(jnp.float32) - mean * s
                from semstereo_tpu.ops.convops import folded_stem_conv

                volume = folded_stem_conv(
                    att_topk, tiled_lc, warped_rc, p0["conv"]["kernel"], s, bb
                )
            else:
                concat_volume = jnp.concatenate([tiled_lc, warped_rc], axis=-1)
                volume = att_topk[..., None] * concat_volume
                volume = self._constrain_disp(volume)
                volume = stem(volume, train)
            volume = ChannelAtt(CHANS2[1] // 4, name="concat_feature_att_4")(
                volume, fl[1], train
            )
            cost = hourglass_cls(32, self.att_window2, name="hourglass")(volume, train)
            cost = Classifier3D(32, name="classif")(cost, train)[..., 0]
            pred = regression_topk(cost, samples, self.refine_topk)
            pred_up = ssr(pred[..., None], spx_pred, pred_label, train)

        if train:
            if self.att_weights_only:
                out["disp"] = (pred_att_up * 4, pred_att * 4)
            else:
                out["disp"] = (pred_up * 4, pred * 4, pred_att_up * 4, pred_att * 4)
        else:
            out["disp"] = ((pred_att_up if self.att_weights_only else pred_up) * 4,)
        return out


class _ConcatFeature(nn.Module):
    """BasicConv 3x3 (128->64) + plain 3x3 conv to 32 channels
    (reference concat_feature, SemStereo.py:221-223)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv(CHANS2[1] // 2, 3, 1, 1, name="cf0")(x, train)
        return TorchConv(
            CHANS2[1] // 4, 3, 1, 1, use_bias=False, fold_stack=train, name="cf1"
        )(x)
