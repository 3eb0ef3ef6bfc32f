"""Convert a PyTorch reference SemStereo state_dict into this package's
flax parameter / batch_stats trees.

Covers the FULL model graph (/root/reference/models/SemStereo.py:184-346):
backbone (delegated to ``timm_convert`` after key renaming), FeatUp, seg
heads, chal reductions, spx chain, patch conv, channel attention, both 3-D
hourglasses (incl. windowed attention qkv/final1x1), classifiers, concat
feature/stem, SSR upsample, and the gamma/beta uncertainty scalars.

This is both the full-graph parity harness used by
tests/test_model_parity_torch.py and a practical importer for reference
training checkpoints (torch.save {'model': state_dict} files — the
``module.`` DataParallel prefix is stripped).

Weight layout conventions (match tests/test_ops_misc.py parity tests):
  conv2d  [O, I, kh, kw]      -> [kh, kw, I, O]
  conv3d  [O, I, kd, kh, kw]  -> [kd, kh, kw, I, O]
  deconv2d [I, O, kh, kw]     -> [kh, kw, I, O]       (stored un-flipped)
  deconv3d [I, O, kd, kh, kw] -> [kd, kh, kw, I, O]
  linear  [O, I]              -> [I, O]
  grouped conv [O, I/g, ...]  -> [..., I/g, O]
"""

from __future__ import annotations

import numpy as np

from semstereo_tpu.utils.timm_convert import convert_state_dict as convert_backbone


def _c2(w):
    return np.transpose(w, (2, 3, 1, 0))


def _c3(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _d2(w):
    return np.transpose(w, (2, 3, 0, 1))


def _d3(w):
    return np.transpose(w, (2, 3, 4, 0, 1))


class _TreeBuilder:
    def __init__(self, sd):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set[str] = set()

    def _get(self, key):
        self.used.add(key)
        return self.sd[key]

    def put(self, tree, path, leaf):
        node = tree
        for p in path.split("/")[:-1]:
            node = node.setdefault(p, {})
        node[path.split("/")[-1]] = np.asarray(leaf)

    def bn(self, dst, src):
        self.put(self.params, f"{dst}/scale", self._get(f"{src}.weight"))
        self.put(self.params, f"{dst}/bias", self._get(f"{src}.bias"))
        self.put(self.stats, f"{dst}/mean", self._get(f"{src}.running_mean"))
        self.put(self.stats, f"{dst}/var", self._get(f"{src}.running_var"))

    def conv(self, dst, src, conv_fn=_c2, bias=False):
        self.put(self.params, f"{dst}/kernel", conv_fn(self._get(f"{src}.weight")))
        if bias:
            self.put(self.params, f"{dst}/bias", self._get(f"{src}.bias"))

    def basic(self, dst, src, conv_fn=_c2):
        """BasicConv / convbn: src.conv + src.bn."""
        self.conv(f"{dst}/conv", f"{src}.conv", conv_fn)
        self.bn(f"{dst}/bn", f"{src}.bn")

    def convbn_seq(self, dst, src, conv_fn=_c3):
        """reference convbn_3d = Sequential(Conv3d, BN3d): src.0 + src.1."""
        self.conv(f"{dst}/conv", f"{src}.0", conv_fn)
        self.bn(f"{dst}/bn", f"{src}.1")

    def conv2x(self, dst, src, deconv=True):
        self.basic(f"{dst}/conv1", f"{src}.conv1", _d2 if deconv else _c2)
        self.basic(f"{dst}/conv2", f"{src}.conv2", _c2)

    def hourglass(self, dst, src):
        for i in (1, 2, 3, 4):
            # Sequential(convbn_3d, ReLU) -> src.convI.0 is the convbn pair
            self.convbn_seq(f"{dst}/conv{i}", f"{src}.conv{i}.0")
        for i in (5, 6):
            # Sequential(ConvTranspose3d, BN3d)
            self.conv(f"{dst}/conv{i}/conv", f"{src}.conv{i}.0", _d3)
            self.bn(f"{dst}/conv{i}/bn", f"{src}.conv{i}.1")
        self.convbn_seq(f"{dst}/redir1", f"{src}.redir1")
        self.convbn_seq(f"{dst}/redir2", f"{src}.redir2")
        att = f"{src}.attention_block"
        self.put(self.params, f"{dst}/attention/qkv/kernel",
                 self._get(f"{att}.qkv_3d.weight").T)
        self.put(self.params, f"{dst}/attention/qkv/bias",
                 self._get(f"{att}.qkv_3d.bias"))
        w = self._get(f"{att}.final1x1.weight")  # [O, I, 1, 1, 1]
        self.put(self.params, f"{dst}/attention/final1x1/kernel", w[:, :, 0, 0, 0].T)
        self.put(self.params, f"{dst}/attention/final1x1/bias",
                 self._get(f"{att}.final1x1.bias"))

    def classifier(self, dst, src):
        """Sequential(convbn_3d, ReLU, Conv3d(bias=False))."""
        self.convbn_seq(f"{dst}/conv0", f"{src}.0")
        self.conv(f"{dst}/conv1", f"{src}.2", _c3)

    def channel_att(self, dst, src):
        self.basic(f"{dst}/im_att0", f"{src}.im_att.0")
        self.conv(f"{dst}/im_att1", f"{src}.im_att.1", _c2, bias=True)

    def seghead(self, dst, src):
        self.basic(f"{dst}/conv1", f"{src}.conv1")
        self.conv(f"{dst}/conv2", f"{src}.conv2", _c2, bias=True)

    def ssr(self, dst, src):
        # conv = Sequential(BN2d(1), Conv2d(1->nc), BN2d(nc))
        self.bn(f"{dst}/conv_bn0", f"{src}.conv.0")
        self.conv(f"{dst}/conv", f"{src}.conv.1", _c2, bias=True)
        self.bn(f"{dst}/conv_bn1", f"{src}.conv.2")
        self.conv(f"{dst}/conv1", f"{src}.conv1.0", _c2, bias=True)
        self.bn(f"{dst}/conv1_bn", f"{src}.conv1.1")
        self.conv(f"{dst}/conv2", f"{src}.conv2.0", _c2, bias=True)
        self.bn(f"{dst}/conv2_bn", f"{src}.conv2.1")
        self.conv(f"{dst}/conv3", f"{src}.conv3", _c2, bias=True)


def convert_semstereo_state_dict(sd: dict) -> tuple[dict, dict, list[str]]:
    """Reference SemStereo state_dict (torch tensors or numpy arrays, with or
    without DataParallel's 'module.' prefix) -> (params, batch_stats,
    unused_keys) for semstereo_tpu.models.SemStereo."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): _np(v)
        for k, v in sd.items()
    }
    tb = _TreeBuilder(sd)

    # --- backbone: rename reference Feature keys to timm layout and delegate
    bb_sd = {}
    for k, v in sd.items():
        if k.startswith("feature.conv_stem."):
            bb_sd[k.replace("feature.conv_stem.", "stem.")] = v
            tb.used.add(k)
        elif k.startswith("feature.block"):
            rest = k[len("feature.block"):]
            stage, tail = rest.split(".", 1)
            bb_sd[f"stages.{stage}.blocks.{tail}"] = v
            tb.used.add(k)
    bb_params, bb_stats = convert_backbone(bb_sd)
    tb.params["feature"] = bb_params
    tb.stats["feature"] = bb_stats

    for lvl, name in ((32, 16), (16, 8), (8, 4), (4, 2)):
        tb.conv2x(f"feature_up/deconv{lvl}_{name}", f"feature_up.deconv{lvl}_{name}")

    if "head_l.conv1.conv.weight" in sd:
        tb.seghead("head_l", "head_l")
        tb.seghead("head_r", "head_r")

    if "gamma" in sd:
        tb.put(tb.params, "gamma", sd["gamma"].reshape(1))
        tb.put(tb.params, "beta", sd["beta"].reshape(1))
        tb.used.update(("gamma", "beta"))

        for i in range(5):
            tb.conv(f"chal_{i}/conv", f"chal_{i}.0", _c2, bias=True)
            tb.bn(f"chal_{i}/bn", f"chal_{i}.1")

        for pair in ("32_16", "16_8", "8_4", "4_2"):
            tb.conv2x(f"spx{pair}", f"spx{pair}")
        tb.conv("spx2", "spx2.0", _d2, bias=True)

        # grouped depthwise patch conv: torch [O, 1, 1, 3, 3] -> [1,3,3,1,O]
        w = tb._get("patch.weight")
        tb.put(tb.params, "patch/kernel", np.transpose(w, (2, 3, 4, 1, 0)))

        tb.channel_att("corr_feature_att_8", "corr_feature_att_8")
        tb.hourglass("hourglass_att", "hourglass_att")
        tb.classifier("classif_att", "classif_att_")
        tb.ssr("ssr_upsample", "ssr_upsample")

    if "concat_stem.conv.weight" in sd:  # stage-2 modules
        tb.basic("concat_feature/cf0", "concat_feature.0")
        tb.conv("concat_feature/cf1", "concat_feature.1", _c2)
        tb.basic("concat_stem", "concat_stem", _c3)
        tb.channel_att("concat_feature_att_4", "concat_feature_att_4")
        tb.hourglass("hourglass", "hourglass")
        tb.classifier("classif", "classif")

    unused = sorted(
        k for k in sd
        if k not in tb.used and not k.endswith("num_batches_tracked")
    )
    return tb.params, tb.stats, unused


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def load_torch_checkpoint(path: str, fresh_params: dict, fresh_stats: dict):
    """Load a reference training checkpoint ({'model': state_dict, ...} or a
    bare state_dict) and merge converted leaves over fresh init — the analog
    of the reference's filtered --loadckpt partial load
    (/root/reference/main_us3d.py:116-123).  Returns (params, stats, n)."""
    import torch

    from semstereo_tpu.train.state import merge_partial_params

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob.state_dict()
    params, stats, _ = convert_semstereo_state_dict(sd)
    merged_p, n1 = merge_partial_params(fresh_params, params)
    merged_s, n2 = merge_partial_params(fresh_stats, stats)
    return merged_p, merged_s, n1 + n2
