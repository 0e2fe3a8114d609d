"""Parity tests for the Pallas shifted-regroup kernel
(ops/shifted_regroup.py) against the XLA slice/roll/concat reference
(nn/attention.py shifted_regroup) — forward, inverse, round trip, and
VJP.  Interpret mode on the CPU mesh (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderformer_tpu.nn.attention import shifted_regroup
from renderformer_tpu.ops.shifted_regroup import (
    regroup_kernel_applicable,
    shifted_regroup_kernel,
)


SHAPES = [
    # (h, w, ws, b, c)
    (16, 16, 8, 2, 16),   # 2x2 window grid: every quadrant wraps
    (32, 32, 8, 1, 8),    # 4x4 grid
    (64, 64, 8, 2, 4),    # the 512^2 production grid
    (16, 32, 8, 1, 8),    # non-square grid
    (8, 8, 4, 2, 8),      # smaller windows (ws=4, shift=2)
]


def _x(h, w, b, c, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h * w, c)), jnp.float32)


@pytest.mark.parametrize('h,w,ws,b,c', SHAPES)
@pytest.mark.parametrize('inverse', [False, True])
def test_kernel_matches_xla(h, w, ws, b, c, inverse):
    s = ws // 2
    assert regroup_kernel_applicable(h * w, (h, w), ws, s)
    x = _x(h, w, b, c)
    want = shifted_regroup(x, h, w, ws, s, inverse=inverse)
    got = shifted_regroup_kernel(x, (h, w), ws, inverse, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_round_trip_identity():
    h = w = 16
    x = _x(h, w, 2, 8)
    y = shifted_regroup_kernel(x, (h, w), 8, False, True)
    back = shifted_regroup_kernel(y, (h, w), 8, True, True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_vjp_is_inverse_permutation():
    h = w = 16
    x = _x(h, w, 1, 8)
    g = _x(h, w, 1, 8, seed=1)

    def loss_k(x_):
        return jnp.sum(shifted_regroup_kernel(x_, (h, w), 8, False, True) * g)

    def loss_ref(x_):
        return jnp.sum(shifted_regroup(x_, h, w, 8, 4) * g)

    np.testing.assert_array_equal(
        np.asarray(jax.grad(loss_k)(x)), np.asarray(jax.grad(loss_ref)(x)))


def test_applicability_gate():
    # non-half shifts and ragged grids fall back to the XLA path
    assert not regroup_kernel_applicable(256, (16, 16), 8, 2)
    assert not regroup_kernel_applicable(256, (16, 16), 8, 3)
    assert not regroup_kernel_applicable(100, (10, 10), 8, 4)
    assert not regroup_kernel_applicable(256, None, 8, 4)
    assert regroup_kernel_applicable(4096, (64, 64), 8, 4)


def test_swin_layer_kernel_vs_xla_regroup():
    """A full shifted SwinSelfAttention forward agrees between the two
    regroup paths (the attention core is the same XLA fallback on CPU)."""
    import os
    from renderformer_tpu.nn.attention import SwinSelfAttention

    mod = SwinSelfAttention(dim=32, num_heads=2, window_size=8,
                            shift_size=4)
    params = mod.init(jax.random.key(0))
    h = w = 16
    x = _x(h, w, 2, 32)
    old = os.environ.get('RFTPU_REGROUP_KERNEL')
    try:
        os.environ['RFTPU_REGROUP_KERNEL'] = '1'
        with_kernel = mod(params, x, impl='flash', grid=(h, w))
        os.environ['RFTPU_REGROUP_KERNEL'] = '0'
        without = mod(params, x, impl='flash', grid=(h, w))
    finally:
        if old is None:
            os.environ.pop('RFTPU_REGROUP_KERNEL', None)
        else:
            os.environ['RFTPU_REGROUP_KERNEL'] = old
    np.testing.assert_allclose(np.asarray(with_kernel),
                               np.asarray(without), atol=1e-5)
