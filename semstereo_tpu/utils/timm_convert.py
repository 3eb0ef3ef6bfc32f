"""Convert a torch ``mobilevitv2_100`` checkpoint into this package's
MobileViTv2Backbone parameter tree.

The reference backbone is timm's pretrained mobilevitv2_100 in features_only
mode (/root/reference/models/SemStereo.py:37).  Training from scratch is the
default here (no network egress); when a torch state_dict file is available
(`timm.create_model('mobilevitv2_100', pretrained=True).state_dict()` saved
with torch.save), this converter maps it onto the flax tree.

Usage:
    python -m semstereo_tpu.utils.timm_convert ckpt.pth out.msgpack
    params = load_backbone_params("out.msgpack")

timm's mobilevitv2 bottleneck blocks are built with ``bottle_in=True``
(mid = in_channels * 2 — the official ml-cvnets convention), matching this
package's InvertedResidual, so every backbone leaf maps 1:1; conversion
still validates shapes leaf-by-leaf and skips any mismatch (caller merges
over fresh init).  tests/test_backbone_convert.py asserts leaf-complete,
numerically-exact conversion against a timm-named torch MobileViTv2.
"""

from __future__ import annotations

import numpy as np


def _conv(w):  # torch [O, I, kh, kw] -> flax [kh, kw, I, O]
    return np.transpose(w, (2, 3, 1, 0))


def _dw_conv(w):  # torch depthwise [C, 1, kh, kw] -> flax [kh, kw, 1, C]
    return np.transpose(w, (2, 3, 1, 0))


def _bn(prefix, sd):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
    }, {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def convert_state_dict(sd: dict) -> tuple[dict, dict]:
    """torch state_dict (numpy values) -> (params, batch_stats) trees for
    MobileViTv2Backbone.  Key layout follows timm's byobnet naming for
    mobilevitv2 ('stem.conv', 'stages.N.blocks...').  Unmappable leaves are
    skipped (caller merges over fresh init with merge_partial_params)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def cna(dst, src):
        """ConvNormAct: src.conv + src.bn -> dst {conv/kernel, bn/{...}}"""
        w = sd.get(f"{src}.conv.weight")
        if w is None:
            return False
        kernel = _dw_conv(w) if w.shape[1] == 1 else _conv(w)
        put(params, (*dst, "conv", "kernel"), kernel)
        bn_p, bn_s = _bn(f"{src}.bn", sd)
        put(params, (*dst, "bn"), bn_p)
        put(stats, (*dst, "bn"), bn_s)
        return True

    cna(("stem",), "stem")
    # timm stage layout: stages.0..4; bottleneck blocks expose
    # conv1_1x1/conv2_kxk/conv3_1x1; mobilevit2 blocks expose conv_kxk/conv_1x1/
    # transformer.N/norm/conv_proj.
    mapping = [
        (("stage0_0",), "stages.0.blocks.0"),
        (("stage1_0",), "stages.1.blocks.0"),
        (("stage1_1",), "stages.1.blocks.1"),
        (("stage2_0",), "stages.2.blocks.0"),
        (("stage3_0",), "stages.3.blocks.0"),
        (("stage4_0",), "stages.4.blocks.0"),
    ]
    for dst, src in mapping:
        cna((*dst, "expand"), f"{src}.conv1_1x1")
        cna((*dst, "dw"), f"{src}.conv2_kxk")
        cna((*dst, "project"), f"{src}.conv3_1x1")

    vit = [(("stage2_1",), "stages.2.blocks.1", 2),
           (("stage3_1",), "stages.3.blocks.1", 4),
           (("stage4_1",), "stages.4.blocks.1", 3)]
    for dst, src, depth in vit:
        cna((*dst, "local_dw"), f"{src}.conv_kxk")
        w = sd.get(f"{src}.conv_1x1.weight")
        if w is not None:
            put(params, (*dst, "local_proj", "kernel"), _conv(w))
        for i in range(depth):
            t = f"{src}.transformer.{i}"
            for flax_name, torch_name in [("norm1", "norm1"), ("norm2", "norm2")]:
                g = sd.get(f"{t}.{torch_name}.weight")
                if g is not None:
                    put(params, (*dst, f"block{i}", flax_name),
                        {"scale": g, "bias": sd[f"{t}.{torch_name}.bias"]})
            qkv_w = sd.get(f"{t}.attn.qkv_proj.weight")
            if qkv_w is not None:
                put(params, (*dst, f"block{i}", "attn", "qkv"),
                    {"kernel": qkv_w[:, :, 0, 0].T, "bias": sd[f"{t}.attn.qkv_proj.bias"]})
                out_w = sd[f"{t}.attn.out_proj.weight"]
                put(params, (*dst, f"block{i}", "attn", "proj"),
                    {"kernel": out_w[:, :, 0, 0].T, "bias": sd[f"{t}.attn.out_proj.bias"]})
            f1 = sd.get(f"{t}.mlp.fc1.weight")
            if f1 is not None:
                put(params, (*dst, f"block{i}", "ffn1"),
                    {"kernel": f1[:, :, 0, 0].T, "bias": sd[f"{t}.mlp.fc1.bias"]})
                f2 = sd[f"{t}.mlp.fc2.weight"]
                put(params, (*dst, f"block{i}", "ffn2"),
                    {"kernel": f2[:, :, 0, 0].T, "bias": sd[f"{t}.mlp.fc2.bias"]})
        g = sd.get(f"{src}.norm.weight")
        if g is not None:
            put(params, (*dst, "norm"), {"scale": g, "bias": sd[f"{src}.norm.bias"]})
        cna((*dst, "proj_out"), f"{src}.conv_proj")

    return params, stats


def _unmapped_paths(fresh: dict, converted: dict) -> list[str]:
    """Leaf paths present in the fresh tree that the conversion did NOT fill
    with a shape-matching value."""
    import jax

    conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    missing = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(fresh)[0]:
        cand = conv_flat.get(path)
        if cand is None or tuple(cand.shape) != tuple(leaf.shape):
            missing.append(jax.tree_util.keystr(path))
    return missing


def load_and_merge(
    ckpt_path: str,
    fresh_params: dict,
    fresh_stats: dict,
    require_complete: bool = True,
):
    """Load a torch .pth state_dict, convert, and merge shape-matching leaves
    over the fresh init.  Returns (params, batch_stats, n_loaded).

    ``require_complete`` (default): raise if ANY backbone leaf is left at its
    fresh init — a naming/semantics mismatch against the real timm checkpoint
    must be a loud error, not a silent from-scratch degradation
    (mobilevitv2_100 pretrained is the reference default,
    /root/reference/models/SemStereo.py:37).  Pass False only for
    intentionally partial checkpoints."""
    import torch

    from semstereo_tpu.train.state import merge_partial_params

    sd = torch.load(ckpt_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    conv_p, conv_s = convert_state_dict(sd)
    if require_complete:
        missing = [
            *(f"params{p}" for p in _unmapped_paths(fresh_params, conv_p)),
            *(f"batch_stats{p}" for p in _unmapped_paths(fresh_stats, conv_s)),
        ]
        if missing:
            head = "\n  ".join(missing[:12])
            more = f"\n  ... and {len(missing) - 12} more" if len(missing) > 12 else ""
            raise ValueError(
                f"timm conversion of {ckpt_path!r} left {len(missing)} backbone "
                f"leaves at fresh init (naming/shape mismatch vs this "
                f"converter's mobilevitv2_100 layout):\n  {head}{more}\n"
                "Pass require_complete=False to accept a partial load."
            )
    params, n1 = merge_partial_params(fresh_params, conv_p)
    stats, n2 = merge_partial_params(fresh_stats, conv_s)
    return params, stats, n1 + n2
