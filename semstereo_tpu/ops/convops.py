"""Low-level convolution helpers with exact PyTorch parity.

Provides channels-last N-D conv / transposed-conv wrappers around
``lax.conv_general_dilated``.  Transposed conv reproduces torch's
``ConvTranspose{2,3}d(kernel, stride, padding, output_padding)`` geometry
(used by FeatUp/spx deconvs k4 s2 p1 and the hourglass upsamplers k3 s2 p1
op1 — /root/reference/models/SemStereo.py:124-133, /root/reference/models/submodule.py:104)
by expressing it as an input-dilated convolution with the spatially-flipped
kernel: pad_lo = k-1-p, pad_hi = k-1-p+output_padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _dim_numbers(ndim_spatial: int):
    if ndim_spatial == 2:
        return ("NHWC", "HWIO", "NHWC")
    if ndim_spatial == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(ndim_spatial)


def conv_nd(
    x: jax.Array,
    kernel: jax.Array,
    stride,
    padding,
    dilation=1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """Channels-last conv.  x: [B, *S, Cin], kernel: [*K, Cin//groups, Cout]."""
    nsp = x.ndim - 2
    stride = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    dilation = (dilation,) * nsp if isinstance(dilation, int) else tuple(dilation)
    if isinstance(padding, int):
        padding = [(padding, padding)] * nsp
    elif padding and isinstance(padding[0], int):
        padding = [(p, p) for p in padding]
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_dim_numbers(nsp),
        feature_group_count=groups,
        precision=precision,
    )


def conv_transpose_nd(
    x: jax.Array,
    kernel: jax.Array,
    stride,
    padding,
    output_padding=0,
    precision=None,
) -> jax.Array:
    """Channels-last transposed conv with torch geometry.

    x: [B, *S, Cin], kernel: [*K, Cin, Cout] (stored un-flipped; flipped
    here).  out_size = (in-1)*stride - 2*padding + k + output_padding.
    """
    nsp = x.ndim - 2
    stride = (stride,) * nsp if isinstance(stride, int) else tuple(stride)
    padding = (padding,) * nsp if isinstance(padding, int) else tuple(padding)
    output_padding = (
        (output_padding,) * nsp if isinstance(output_padding, int) else tuple(output_padding)
    )
    ks = kernel.shape[:nsp]
    pads = [
        (k - 1 - p, k - 1 - p + op) for k, p, op in zip(ks, padding, output_padding)
    ]
    flipped = jnp.flip(kernel, axis=tuple(range(nsp)))
    return lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,) * nsp,
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_dim_numbers(nsp),
        precision=precision,
    )
