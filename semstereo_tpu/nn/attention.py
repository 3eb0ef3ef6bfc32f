"""Windowed 3-D multi-head self-attention over cost volumes.

Re-design of the reference ``attention_block``
(/root/reference/models/submodule_other.py:790-837): the (D, H, W) volume is
split into (bd, bh, bw) windows, each window runs standard MHSA, with an
additive -1000 bias blocking attention between padded and real cells when
H/W are not window multiples.  Token layout inside a window is (bd, bh, bw)
— identical to the reference's permute order — so the padding mask tiles the
same way.

TPU notes: windows are small (64/96 tokens, C=128) so attention is a pair of
batched ``dot_general`` contractions that land directly on the MXU; no
flash-attention machinery is needed at these sizes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class WindowedAttention3D(nn.Module):
    num_heads: int = 16
    window: tuple[int, int, int] = (4, 4, 4)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, d0, h0, w0, c = x.shape
        bd, bh, bw = self.window
        # All three dims are padded to window multiples with masked attention
        # (the reference only ever pads H/W — its configs keep D divisible —
        # but reduced-maxdisp configs here can make D smaller than bd).
        pad_d = (-d0) % bd
        pad_b = (-h0) % bh
        pad_r = (-w0) % bw
        d, h, w = d0 + pad_d, h0 + pad_b, w0 + pad_r
        any_pad = bool(pad_d or pad_b or pad_r)
        if any_pad:
            x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0)))

        nd, nh, nw = d // bd, h // bh, w // bw
        t = bd * bh * bw
        # [B, nd, bd, nh, bh, nw, bw, C] -> [B, nd, nh, nw, bd, bh, bw, C]
        xw = x.reshape(b, nd, bd, nh, bh, nw, bw, c)
        xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, nd * nh * nw, t, c)

        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(xw)
        hd = c // self.num_heads
        qkv = qkv.reshape(b, nd * nh * nw, t, 3, self.num_heads, hd)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # [B, NW, T, heads, hd] -> attention over T
        scale = hd**-0.5
        attn = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k) * scale

        if any_pad:
            padded = (
                jnp.zeros((d, h, w), bool)
                .at[d0:, :, :].set(True)
                .at[:, h0:, :].set(True)
                .at[:, :, w0:].set(True)
            )
            # per-window flags in token order (bd, bh, bw)
            pw = (
                padded.reshape(nd, bd, nh, bh, nw, bw)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(nd * nh * nw, t)
            )
            bias = jnp.where(pw[:, None, :] != pw[:, :, None], -1000.0, 0.0)
            attn = attn + bias[None, :, None].astype(attn.dtype)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, v).reshape(b, nd * nh * nw, t, c)

        out = out.reshape(b, nd, nh, nw, bd, bh, bw, c)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)
        if any_pad:
            out = out[:, :d0, :h0, :w0]
        return nn.Dense(c, use_bias=True, name="final1x1")(out)
