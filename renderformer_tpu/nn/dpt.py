"""DPT multi-scale conv decoder head (parity with
/root/reference/renderformer/layers/dpt.py:28-273), NHWC layout.

Fuses the outputs of 4 decoder layers into a full-resolution image:
per-layer 1x1 projection -> resize (convT x4 / convT x2 / identity /
strided conv /2) -> 3x3 "scratch" convs -> refinenet fusion with
bilinear align_corners upsampling -> output convs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

from renderformer_tpu.nn.conv import (
    conv2d,
    conv2d_init,
    conv_transpose2d_block,
    resize_bilinear_align_corners,
)
from renderformer_tpu.nn.core import silu


def _tail_mode() -> str:
    """Output-tail evaluation strategy (RFTPU_DPT_TAIL):

    * ``plain``    — sequential convs as written (reference semantics;
      the 128->64->32->3 channel funnel starves the 128-lane MXU:
      41-75 TF/s, ~7.9 ms at 512^2 x8 views on v5e);
    * ``s2d``      — each 3x3 conv in space-to-depth form (ops/s2d_conv):
      hits the 194 TF/s roof but 4x FLOPs + the layout copy make it a
      measured net LOSS (96.8 vs 94.0 ms/step device) — kept for A/B;
    * ``composed`` — conv1/conv2a composed into ONE 5x5 conv before the
      s2d transform (36/25 tap overhead instead of 4x) with an exact
      1px ring fix (ops/dpt_tail.py).  Default.

    All three are exact up to fp summation order
    (tests/test_dpt_tail.py, tests/test_s2d_conv.py).
    """
    import os
    mode = os.environ.get('RFTPU_DPT_TAIL', '')
    if mode in ('plain', 's2d', 'composed'):
        return mode
    # legacy round-3 A/B flag
    if os.environ.get('RFTPU_S2D_TAIL', '0') != '0':
        return 's2d'
    return 'composed'


def _block_diag_1x1(kernel):
    """[1, 1, C, O] -> [1, 1, 4C, 4O] block-diagonal kernel: a 1x1 conv
    commutes with space-to-depth (it mixes channels per pixel)."""
    _, _, c, o = kernel.shape
    kk = jnp.zeros((1, 1, 4 * c, 4 * o), kernel.dtype)
    for i in range(4):
        kk = kk.at[0, 0, i * c:(i + 1) * c, i * o:(i + 1) * o].set(
            kernel[0, 0])
    return kk


def _output_tail_s2d(scratch, x):
    """output_conv1 -> output_conv2 chain in space-to-depth form, one
    layout pass each way (module docstring of ops/s2d_conv.py has the
    math; parity with reference dpt.py:243-273)."""
    from renderformer_tpu.ops.s2d_conv import (
        depth_to_space, s2d_block_kernel, space_to_depth)
    oc1 = scratch['output_conv1']
    oc2 = scratch['output_conv2']
    x = space_to_depth(x)
    x = conv2d(x, s2d_block_kernel(oc1['kernel']),
               jnp.tile(oc1['bias'], 4), padding=1)
    x = conv2d(x, s2d_block_kernel(oc2['conv1']['kernel']),
               jnp.tile(oc2['conv1']['bias'], 4), padding=1)
    x = silu(x)
    x = conv2d(x, _block_diag_1x1(oc2['conv2']['kernel']),
               jnp.tile(oc2['conv2']['bias'], 4))
    return depth_to_space(x)


def _residual_conv_unit(params, x):
    """act -> conv -> act -> conv -> +x (dpt.py:57-92), SiLU activation."""
    out = silu(x)
    out = conv2d(out, params['conv1']['kernel'], params['conv1']['bias'], padding=1)
    out = silu(out)
    out = conv2d(out, params['conv2']['kernel'], params['conv2']['bias'], padding=1)
    return out + x


def _rcu_init(key, features):
    k1, k2 = jax.random.split(key)
    return {
        'conv1': conv2d_init(k1, 3, 3, features, features, bias=True),
        'conv2': conv2d_init(k2, 3, 3, features, features, bias=True),
    }


def _fusion_block(params, x, res=None, size=None, has_resconv1=True,
                  skip_resize=False):
    """FeatureFusionBlock (dpt.py:95-159): optional residual add via RCU1,
    RCU2, bilinear x2 (or to `size`) align_corners=True, 1x1 out conv.

    The reference applies out_conv AFTER the upsample; a 1x1 conv mixes
    channels per pixel and bilinear interpolation mixes pixels per
    channel, so the two commute exactly (up to fp rounding) — we run
    out_conv at the pre-upsample resolution, 4x cheaper (~1 ms/step at
    512^2 on v5e, where the post-resize conv is HBM-bound).

    ``skip_resize`` returns the pre-upsample tensor: the composed output
    tail fuses the final x2 upsample with its space-to-depth transform
    (ops/fused_resize.fused_resize_s2d)."""
    if res is not None:
        assert has_resconv1
        x = x + _residual_conv_unit(params['resConvUnit1'], res)
    x = _residual_conv_unit(params['resConvUnit2'], x)
    if size is None:
        size = (x.shape[1] * 2, x.shape[2] * 2)
    x = conv2d(x, params['out_conv']['kernel'], params['out_conv']['bias'])
    if skip_resize:
        return x
    return resize_bilinear_align_corners(x, size)


def _fusion_init(key, features, no_resconv1=False):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        'out_conv': conv2d_init(k1, 1, 1, features, features, bias=True),
        'resConvUnit2': _rcu_init(k3, features),
    }
    if not no_resconv1:
        params['resConvUnit1'] = _rcu_init(k2, features)
    return params


@dataclass(frozen=True)
class DPTHead:
    in_channels: int
    features: int = 256
    out_channels: tuple = (256, 512, 1024, 1024)
    out_dim: int = 3

    def init(self, key):
        keys = jax.random.split(key, 16)
        oc = list(self.out_channels)
        params = {
            'projects': [
                conv2d_init(keys[i], 1, 1, self.in_channels, oc[i], bias=True)
                for i in range(4)
            ],
            # resize_layers: convT(4,4), convT(2,2), identity, conv3x3 s2 p1
            'resize_layers': [
                conv2d_init(keys[4], 4, 4, oc[0], oc[0], bias=True),
                conv2d_init(keys[5], 2, 2, oc[1], oc[1], bias=True),
                {},
                conv2d_init(keys[6], 3, 3, oc[3], oc[3], bias=True),
            ],
            'scratch': {
                'layer1_rn': conv2d_init(keys[7], 3, 3, oc[0], self.features, bias=False),
                'layer2_rn': conv2d_init(keys[8], 3, 3, oc[1], self.features, bias=False),
                'layer3_rn': conv2d_init(keys[9], 3, 3, oc[2], self.features, bias=False),
                'layer4_rn': conv2d_init(keys[10], 3, 3, oc[3], self.features, bias=False),
                'refinenet1': _fusion_init(keys[11], self.features),
                'refinenet2': _fusion_init(keys[12], self.features),
                'refinenet3': _fusion_init(keys[13], self.features),
                'refinenet4': _fusion_init(keys[14], self.features, no_resconv1=True),
                'output_conv1': conv2d_init(
                    keys[15], 3, 3, self.features, self.features // 2, bias=True),
                'output_conv2': {
                    'conv1': conv2d_init(keys[0], 3, 3, self.features // 2, 32, bias=True),
                    'conv2': conv2d_init(keys[1], 1, 1, 32, self.out_dim, bias=True),
                },
            },
        }
        return params

    def __call__(self, params, out_features: Sequence[jnp.ndarray],
                 patch_h: int, patch_w: int, patch_size: int = 16):
        """out_features: 4 token tensors [B, N, D] (N = patch_h*patch_w).

        Returns image [B, H, W, out_dim] (NHWC; caller permutes if needed).
        """
        scratch = params['scratch']
        feats = []
        for i, x in enumerate(out_features):
            b, n, d = x.shape
            x = x.reshape(b, patch_h, patch_w, d)
            p = params['projects'][i]
            x = conv2d(x, p['kernel'], p['bias'])
            r = params['resize_layers'][i]
            if i == 0:
                x = conv_transpose2d_block(x, r['kernel'], r['bias'], stride=4)
            elif i == 1:
                x = conv_transpose2d_block(x, r['kernel'], r['bias'], stride=2)
            elif i == 3:
                x = conv2d(x, r['kernel'], r['bias'], stride=2, padding=1)
            feats.append(x)

        l1 = conv2d(feats[0], scratch['layer1_rn']['kernel'], padding=1)
        l2 = conv2d(feats[1], scratch['layer2_rn']['kernel'], padding=1)
        l3 = conv2d(feats[2], scratch['layer3_rn']['kernel'], padding=1)
        l4 = conv2d(feats[3], scratch['layer4_rn']['kernel'], padding=1)

        p4 = _fusion_block(scratch['refinenet4'], l4,
                           size=l3.shape[1:3], has_resconv1=False)
        p3 = _fusion_block(scratch['refinenet3'], p4, l3, size=l2.shape[1:3])
        p2 = _fusion_block(scratch['refinenet2'], p3, l2, size=l1.shape[1:3])

        out_hw = (patch_h * patch_size, patch_w * patch_size)
        mode = _tail_mode()
        # the fast tails require the mid-tail resize to be the identity
        # (refinenet1's x2 upsample already lands at full resolution for
        # patch_size 8) and even spatial dims for space-to-depth
        t_hw = (l1.shape[1] * 2, l1.shape[2] * 2)
        fast_ok = (t_hw == out_hw and out_hw[0] % 2 == 0
                   and out_hw[1] % 2 == 0)
        if mode == 'composed' and fast_ok:
            from renderformer_tpu.ops.dpt_tail import composed_tail_full
            from renderformer_tpu.ops.fused_resize import (
                fused_resize_s2d, fused_resize_s2d_supported)
            oc1 = scratch['output_conv1']
            oc2 = scratch['output_conv2']
            t = _fusion_block(scratch['refinenet1'], p2, l1,
                              skip_resize=True)
            if fused_resize_s2d_supported(t, out_hw):
                # upsample directly into s2d layout; the full-res u is
                # never materialized (borders come from 1-D edge resizes
                # — align_corners maps edges to edges exactly)
                u_s2d = fused_resize_s2d(t, out_hw)
                from renderformer_tpu.nn.conv import _resize_axis
                borders = (
                    _resize_axis(t[:, 0], 1, out_hw[1]),
                    _resize_axis(t[:, -1], 1, out_hw[1]),
                    _resize_axis(t[:, :, 0], 1, out_hw[0]),
                    _resize_axis(t[:, :, -1], 1, out_hw[0]),
                )
                u = None
            else:
                u = resize_bilinear_align_corners(t, out_hw)
                u_s2d = borders = None
            return composed_tail_full(
                u, oc1['kernel'], oc1['bias'],
                oc2['conv1']['kernel'], oc2['conv1']['bias'],
                oc2['conv2']['kernel'], oc2['conv2']['bias'], silu,
                u_s2d=u_s2d, borders=borders)

        p1 = _fusion_block(scratch['refinenet1'], p2, l1)
        if mode == 's2d' and fast_ok and p1.shape[1:3] == out_hw:
            return _output_tail_s2d(scratch, p1)
        out = conv2d(p1, scratch['output_conv1']['kernel'],
                     scratch['output_conv1']['bias'], padding=1)
        out = resize_bilinear_align_corners(out, out_hw)
        oc2 = scratch['output_conv2']
        out = conv2d(out, oc2['conv1']['kernel'], oc2['conv1']['bias'], padding=1)
        out = silu(out)
        out = conv2d(out, oc2['conv2']['kernel'], oc2['conv2']['bias'])
        return out
