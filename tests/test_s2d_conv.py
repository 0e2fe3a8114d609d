"""Space-to-depth conv equivalence (ops/s2d_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderformer_tpu.nn.conv import conv2d
from renderformer_tpu.ops.s2d_conv import (
    conv2d_s2d,
    depth_to_space,
    s2d_block_kernel,
    space_to_depth,
)


@pytest.mark.parametrize('c,o', [(64, 32), (128, 64), (32, 3), (5, 7)])
def test_conv2d_s2d_matches_conv2d(c, o):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c, o)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(o,)), jnp.float32)
    ref = conv2d(x, k, b, padding=1)
    got = conv2d_s2d(x, k, b, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_s2d_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 8, 12, 4)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_block_kernel_sparsity():
    """3/4 of the block-kernel taps are structurally zero."""
    k = jnp.ones((3, 3, 2, 2), jnp.float32)
    kk = np.asarray(s2d_block_kernel(k))
    nonzero = (np.abs(kk).reshape(9, 4, 2, 4, 2).sum(axis=(2, 4)) > 0)
    assert nonzero.sum() == 9 * 4  # 9 taps x 4 output offsets each
    assert kk.size == 9 * 8 * 8


@pytest.mark.slow
def test_dpt_tail_s2d_matches_plain(monkeypatch):
    """The DPT head with the s2d output tail matches the plain tail
    (nn/dpt.py _output_tail_s2d; reference dpt.py:243-273 semantics)."""
    from renderformer_tpu.nn.dpt import DPTHead

    head = DPTHead(in_channels=64, features=32, out_channels=(24, 48, 96, 96))
    params = head.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    ph = pw = 8   # tokens 8x8 -> image 64x64 at patch_size 8
    feats = [jnp.asarray(rng.normal(size=(2, ph * pw, 64)), jnp.float32)
             for _ in range(4)]

    monkeypatch.setenv('RFTPU_DPT_TAIL', 'plain')
    ref = head(params, feats, ph, pw, patch_size=8)
    monkeypatch.setenv('RFTPU_DPT_TAIL', 's2d')
    got = head(params, feats, ph, pw, patch_size=8)
    assert ref.shape == got.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)

    # gradients agree through both tails
    def loss(params, flag):
        monkeypatch.setenv('RFTPU_DPT_TAIL', flag)
        return jnp.sum(head(params, feats, ph, pw, patch_size=8) ** 2)

    g0 = jax.grad(loss)(params, 'plain')
    g1 = jax.grad(loss)(params, 's2d')
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3), g0, g1)


def test_conv2d_s2d_grad_matches():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 6)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 4)) * 0.1, jnp.float32)

    def loss_ref(k, x):
        return jnp.sum(conv2d(x, k, padding=1) ** 2)

    def loss_s2d(k, x):
        return jnp.sum(conv2d_s2d(x, k, padding=1) ** 2)

    g_ref = jax.grad(loss_ref)(k, x)
    g_s2d = jax.grad(loss_s2d)(k, x)
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
