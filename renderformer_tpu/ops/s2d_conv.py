"""Space-to-depth evaluation of 3x3 stride-1 convolutions.

The DPT output tail runs 3x3 convs at 512^2 with 64/32/3 channels
(nn/dpt.py output_conv1/output_conv2, parity with reference
dpt.py:243-273).  On the MXU those starve: the contraction dim is
9*Cin and the output dim Cout sits far below the 128-lane width, so
XLA's conv lowering reaches only ~20-100 TF/s (measured, v5e — see
tools/dpt_micro.py).

Space-to-depth by r=2 re-expresses the same conv on a [H/2, W/2, 4*Cin]
tensor with a 3x3 block kernel of shape [3, 3, 4*Cin, 4*Cout]: 4x the
nominal FLOPs (each output element now contracts over a 6x6 input
neighborhood, 3/4 of whose taps are structurally zero) but with a 4x
wider contraction and 4x more output lanes, which the MXU turns into a
net win at these shapes.  The transform is exact up to matmul summation
order.

Packing convention: s2d(x)[i, j, (a*2+b)*C + c] = x[2i+a, 2j+b, c].
For output offset (a, b) and original tap (dy, dx):
    t = a+dy, s = b+dx ∈ {-1..2};  in-block (t mod 2, s mod 2),
    block offset ((t - t mod 2)/2, (s - s mod 2)/2) ∈ {-1, 0, 1}.
Zero-padding parity: the original conv pads 1 pixel; the block conv
pads 1 block (2 pixels), but every tap that would read the extra pixel
ring is structurally zero, so the results match exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def s2d_block_kernel(kernel):
    """[3, 3, C, O] -> [3, 3, 4C, 4O] block kernel (see module docstring)."""
    kh, kw, c, o = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    kk = jnp.zeros((3, 3, 4 * c, 4 * o), kernel.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    t, s = a + dy, b + dx
                    ci, cj = t % 2, s % 2
                    u, v = (t - ci) // 2, (s - cj) // 2
                    kk = kk.at[
                        u + 1, v + 1,
                        (ci * 2 + cj) * c:(ci * 2 + cj + 1) * c,
                        (a * 2 + b) * o:(a * 2 + b + 1) * o,
                    ].set(kernel[dy + 1, dx + 1])
    return kk


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (H, W even)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """[B, H, W, 4C] -> [B, 2H, 2W, C]."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def conv2d_s2d(x, kernel, bias=None, padding: int = 1):
    """3x3 stride-1 pad-1 conv evaluated in space-to-depth form.

    x: [B, H, W, Cin] (H, W even); kernel: [3, 3, Cin, Cout].
    Exact (up to fp summation order) match of
    ``conv2d(x, kernel, bias, padding=1)``.
    """
    assert padding == 1
    from renderformer_tpu.nn.conv import conv2d
    y = conv2d(space_to_depth(x), s2d_block_kernel(kernel), padding=1)
    y = depth_to_space(y)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
