"""Ring attention vs single-device attention on the 8-device CPU mesh:
forward and gradients must match (SURVEY.md §2.8 / §7.3 — sequence
parallelism is new in this framework; the reference has none)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderformer_tpu.nn.attention import sdpa_xla
from renderformer_tpu.parallel.ring_attention import ring_attention
from renderformer_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope='module')
def mesh24():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    return make_mesh((2, 4))


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


@pytest.mark.parametrize('masked', [False, True])
@pytest.mark.parametrize('cross', [False, True])
def test_ring_forward_matches_sdpa(mesh24, masked, cross):
    rng = np.random.default_rng(0)
    b, sq, h, d = 2, 16, 2, 32
    sk = 24 if cross else sq
    q = _rand(rng, b, sq, h, d)
    k = _rand(rng, b, sk, h, d)
    v = _rand(rng, b, sk, h, d)
    mask = None
    if masked:
        mask = jnp.asarray(rng.uniform(size=(b, sk)) > 0.3)
        mask = mask.at[:, :4].set(True)  # at least one valid key per ring shard

    ref = sdpa_xla(q, k, v, mask[:, None, None, :] if masked else None)
    out = jax.jit(lambda *a: ring_attention(
        *a, mesh=mesh24, impl='xla'))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_ring_gradients_match_sdpa(mesh24):
    rng = np.random.default_rng(1)
    b, sq, sk, h, d = 2, 8, 16, 2, 32
    q = _rand(rng, b, sq, h, d)
    k = _rand(rng, b, sk, h, d)
    v = _rand(rng, b, sk, h, d)
    mask = jnp.asarray(rng.uniform(size=(b, sk)) > 0.3).at[:, ::4].set(True)
    tgt = _rand(rng, b, sq, h, d)

    def loss_ref(q, k, v):
        return jnp.sum((sdpa_xla(q, k, v, mask[:, None, None, :]) - tgt) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum((ring_attention(q, k, v, mask, mesh=mesh24,
                                       impl='xla') - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-4)


def test_ring_fully_masked_shard_is_finite(mesh24):
    """A KV shard that is entirely padding must contribute exact zeros."""
    rng = np.random.default_rng(2)
    b, sq, sk, h, d = 2, 8, 16, 2, 32
    q = _rand(rng, b, sq, h, d)
    k = _rand(rng, b, sk, h, d)
    v = _rand(rng, b, sk, h, d)
    mask = jnp.zeros((b, sk), bool).at[:, :4].set(True)  # only shard 0 valid

    ref = sdpa_xla(q, k, v, mask[:, None, None, :])
    out = jax.jit(lambda *a: ring_attention(
        *a, mesh=mesh24, impl='xla'))(q, k, v, mask)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_ring_flash_interpret_matches_sdpa(mesh24):
    """The flash-kernel ring path (interpret mode on CPU), fwd + grads.
    Shapes lane-aligned as the kernels require."""
    rng = np.random.default_rng(3)
    b, sq, sk, h, d = 2, 256, 512, 2, 128
    q = _rand(rng, b, sq, h, d)
    k = _rand(rng, b, sk, h, d)
    v = _rand(rng, b, sk, h, d)
    mask = jnp.asarray(rng.uniform(size=(b, sk)) > 0.3).at[:, ::64].set(True)

    ref = sdpa_xla(q, k, v, mask[:, None, None, :])
    out = jax.jit(lambda *a: ring_attention(
        *a, mesh=mesh24, impl='flash', interpret=True))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    tgt = _rand(rng, b, sq, h, d)

    def loss_ring(q, k, v):
        return jnp.sum((ring_attention(q, k, v, mask, mesh=mesh24,
                                       impl='flash', interpret=True)
                        - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((sdpa_xla(q, k, v, mask[:, None, None, :]) - tgt) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3)


def test_ring_rejects_indivisible_seq(mesh24):
    rng = np.random.default_rng(4)
    q = _rand(rng, 2, 10, 2, 32)  # 10 % 4 != 0
    with pytest.raises(ValueError):
        ring_attention(q, q, q, mesh=mesh24, impl='xla')
