"""Conv primitives with exact PyTorch parity, NHWC layout (TPU-native).

Weights are stored HWIO; the torch converter maps OIHW -> HWIO.
``conv_transpose2d_block`` exploits that both DPT transposed convs use
stride == kernel_size and zero padding (dpt.py:194-206), which makes the
op a non-overlapping block expansion — a single MXU matmul, no scatter.

Bilinear align_corners=True resizes (dpt.py:154-155,269-270) are
implemented as static gathers + lerp along each axis, exact (the weights
come from the same closed form as the torch interp grid) and
layout-preserving in NHWC, since jax.image.resize has no align_corners
mode. (An earlier interp-matrix-matmul formulation forced XLA to patch
transposed dot layouts with copy fusions — ~1.3 ms/iter at 512^2.)
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DN = ('NHWC', 'HWIO', 'NHWC')


def conv2d(x, kernel, bias=None, stride: int = 1, padding: int = 0):
    """x: [B, H, W, Cin]; kernel: [kh, kw, Cin, Cout].

    Inputs stay in their dtype (bf16 on the fast path -> full MXU rate);
    accumulation is fp32, output cast back to the input dtype.
    """
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d_init(key, kh, kw, cin, cout, bias=True, groups: int = 1):
    """torch.nn.Conv2d default init (kaiming uniform, fan_in = cin*kh*kw)."""
    wkey, bkey = jax.random.split(key)
    fan_in = cin * kh * kw // groups
    bound = 1.0 / math.sqrt(fan_in)
    params = {'kernel': jax.random.uniform(
        wkey, (kh, kw, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        params['bias'] = jax.random.uniform(
            bkey, (cout,), jnp.float32, -bound, bound)
    return params


def conv_transpose2d_block(x, kernel, bias=None, stride: int = 2):
    """Transposed conv with kernel_size == stride, padding 0.

    x: [B, H, W, Cin]; kernel: [kh, kw, Cin, Cout] with kh == kw == stride.
    Each input pixel emits an independent kh x kw output block:
        out[b, i*s+di, j*s+dj, o] = sum_c x[b,i,j,c] * K[di,dj,c,o]
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    assert kh == stride and kw == stride
    y = jnp.einsum('bhwc,ijco->bhiwjo', x, kernel.astype(x.dtype))
    y = y.reshape(b, h * kh, w * kw, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


@functools.lru_cache(maxsize=128)
def _interp_gather(n_in: int, n_out: int):
    """Static (i0, i1, frac) so out[o] = (1-frac[o])*x[i0[o]] + frac[o]*x[i1[o]],
    align_corners=True semantics."""
    if n_out == 1 or n_in == 1:
        return (np.zeros(n_out, np.int32), np.zeros(n_out, np.int32),
                np.zeros(n_out, np.float32))
    coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(coords).astype(np.int32), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = (coords - i0).astype(np.float32)
    return i0, i1, frac


def _resize_axis(x, axis: int, n_out: int):
    i0, i1, frac = _interp_gather(x.shape[axis], n_out)
    shape = [1] * x.ndim
    shape[axis] = n_out
    f = jnp.asarray(frac, x.dtype).reshape(shape)
    lo = jnp.take(x, jnp.asarray(i0), axis=axis)
    hi = jnp.take(x, jnp.asarray(i1), axis=axis)
    return lo * (1 - f) + hi * f


def _fuse_resize_enabled() -> bool:
    """Pallas banded-matmul resize on TPU (see ops/fused_resize.py).

    Default on: measured 2-6x per-site over the gather path on v5e at
    the DPT refinenet shapes. RFTPU_FUSE_RESIZE=0 opts out.
    """
    import os
    return os.environ.get('RFTPU_FUSE_RESIZE', '1') != '0'


def resize_bilinear_align_corners(x, out_hw: Tuple[int, int]):
    """x: [B, H, W, C] -> [B, out_h, out_w, C]; gathers keep NHWC layout."""
    out_h, out_w = out_hw
    if (x.shape[1], x.shape[2]) == (out_h, out_w):
        return x
    if _fuse_resize_enabled():
        from renderformer_tpu.ops.fused_resize import (
            fused_resize, fused_resize_supported)
        if fused_resize_supported(x, out_hw):
            return fused_resize(x, out_hw)
    if x.shape[1] != out_h:
        x = _resize_axis(x, 1, out_h)
    if x.shape[2] != out_w:
        x = _resize_axis(x, 2, out_w)
    return x
