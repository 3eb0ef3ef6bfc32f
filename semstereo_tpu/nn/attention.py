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
        assert d0 % bd == 0, f"depth {d0} must divide window depth {bd}"
        pad_b = (-h0) % bh
        pad_r = (-w0) % bw
        h, w = h0 + pad_b, w0 + pad_r
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        nd, nh, nw = d0 // bd, h // bh, w // bw
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

        if pad_b or pad_r:
            padded = jnp.zeros((h, w), bool).at[h0:, :].set(True).at[:, w0:].set(True)
            # per hw-window flags in (bh, bw) order, tiled over bd
            pw = padded.reshape(nh, bh, nw, bw).transpose(0, 2, 1, 3).reshape(nh * nw, bh * bw)
            pw = jnp.tile(pw, (1, bd))  # token order (bd, bh, bw) -> tile bd copies
            bias = jnp.where(pw[:, None, :] != pw[:, :, None], -1000.0, 0.0)
            bias = jnp.tile(bias[None], (nd, 1, 1)).reshape(nd * nh * nw, t, t)
            attn = attn + bias[None, :, None]

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, v).reshape(b, nd * nh * nw, t, c)

        out = out.reshape(b, nd, nh, nw, bd, bh, bw, c)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d0, h, w, c)
        if pad_b or pad_r:
            out = out[:, :, :h0, :w0]
        return nn.Dense(c, use_bias=True, name="final1x1")(out)
