"""Composed 5x5 s2d DPT tail (ops/dpt_tail.py): exact parity with the
sequential conv1 -> conv2a chain, including the 1px border ring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderformer_tpu.nn.conv import conv2d
from renderformer_tpu.ops.dpt_tail import (
    compose_conv3x3_pair,
    composed_tail,
    s2d_block_kernel5,
)


def _rand(shape, seed, scale=0.2):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale, jnp.float32)


def _ref_chain(u, k1, b1, k2, b2):
    return conv2d(conv2d(u, k1, b1, padding=1), k2, b2, padding=1)


@pytest.mark.parametrize('c,m,o,h', [(6, 4, 5, 16), (8, 8, 8, 12)])
def test_composed_tail_exact(c, m, o, h):
    u = _rand((2, h, h, c), 0, 1.0)
    k1, b1 = _rand((3, 3, c, m), 1), _rand((m,), 2)
    k2, b2 = _rand((3, 3, m, o), 3), _rand((o,), 4)
    want = _ref_chain(u, k1, b1, k2, b2)
    got = composed_tail(u, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_composed_interior_without_ring_fix():
    """The composed conv alone is exact on the interior — the ring fix
    only touches the border (sanity of the decomposition)."""
    from renderformer_tpu.ops.s2d_conv import depth_to_space, space_to_depth
    u = _rand((1, 12, 12, 4), 5, 1.0)
    k1, b1 = _rand((3, 3, 4, 6), 6), _rand((6,), 7)
    k2, b2 = _rand((3, 3, 6, 3), 8), _rand((3,), 9)
    k5, b5 = compose_conv3x3_pair(k1, b1, k2, b2)
    z = depth_to_space(conv2d(space_to_depth(u), s2d_block_kernel5(k5),
                              jnp.tile(b5, 4), padding=1))
    want = _ref_chain(u, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(z)[:, 1:-1, 1:-1],
                               np.asarray(want)[:, 1:-1, 1:-1],
                               rtol=1e-4, atol=1e-4)
    # ...and the ring genuinely differs without the fix (the correction
    # is load-bearing, not vacuous)
    assert not np.allclose(np.asarray(z)[:, 0], np.asarray(want)[:, 0],
                           atol=1e-4)


def test_composed_tail_grad():
    u = _rand((1, 8, 8, 4), 10, 1.0)
    k1, b1 = _rand((3, 3, 4, 6), 11), _rand((6,), 12)
    k2, b2 = _rand((3, 3, 6, 3), 13), _rand((3,), 14)

    def loss(fn, *args):
        return jnp.sum(fn(u, *args) ** 2)

    g_ref = jax.grad(lambda *a: loss(_ref_chain, *a), argnums=(0, 1, 2, 3))(
        k1, b1, k2, b2)
    g_got = jax.grad(lambda *a: loss(composed_tail, *a), argnums=(0, 1, 2, 3))(
        k1, b1, k2, b2)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_dpt_head_composed_matches_plain(monkeypatch):
    """Full DPT head: composed tail == plain tail (the default path on
    TPU; reference dpt.py:243-273 semantics)."""
    from renderformer_tpu.nn.dpt import DPTHead

    head = DPTHead(in_channels=64, features=32, out_channels=(24, 48, 96, 96))
    params = head.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    ph = pw = 8
    feats = [jnp.asarray(rng.normal(size=(2, ph * pw, 64)), jnp.float32)
             for _ in range(4)]

    monkeypatch.setenv('RFTPU_DPT_TAIL', 'plain')
    ref = head(params, feats, ph, pw, patch_size=8)
    monkeypatch.setenv('RFTPU_DPT_TAIL', 'composed')
    got = head(params, feats, ph, pw, patch_size=8)
    assert ref.shape == got.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
