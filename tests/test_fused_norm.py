"""Pallas fused RMSNorm parity vs the XLA path (interpret mode on CPU;
the same kernel compiles on TPU). Forward (exact for fp32, bit-matching
op order for bf16) and gradients for input and scale, including the
padded-rows path (row counts not divisible by 8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderformer_tpu.nn.core import rms_norm, ATTN_EPS
from renderformer_tpu.ops.fused_norm import (
    fused_rms_norm, fused_rms_norm_supported)


def _xla_rms(x, scale, eps):
    return rms_norm({'scale': scale}, x, eps)


@pytest.mark.parametrize('shape', [(2, 256, 128), (4, 96, 256), (771, 128)])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_forward_parity(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 3.0, dtype)
    scale = jnp.asarray(rng.normal(size=shape[-1:]), dtype)

    want = _xla_rms(x, scale, ATTN_EPS)
    got = fused_rms_norm(x, scale, ATTN_EPS, interpret=True)
    assert got.dtype == x.dtype
    tol = 0 if dtype == jnp.float32 else 0
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-6 if dtype == jnp.float32 else 2e-2, rtol=1e-6)


def test_forward_fp32_scale_on_bf16_input():
    """Training keeps fp32 master weights; the kernel must cast the scale
    the same way the XLA path does."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(512, 128)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    want = _xla_rms(x, scale, ATTN_EPS)
    got = fused_rms_norm(x, scale, ATTN_EPS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize('rows', [512, 771])  # 771: padded-rows path
def test_gradients_match_xla(rows):
    rng = np.random.default_rng(2)
    d = 128
    x = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)

    def loss_fused(x, s):
        return jnp.sum(fused_rms_norm(x, s, ATTN_EPS, interpret=True) * cot)

    def loss_xla(x, s):
        return jnp.sum(_xla_rms(x, s, ATTN_EPS) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, scale)
    gx = jax.grad(loss_xla, argnums=(0, 1))(x, scale)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_gradients_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(256, 128)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    def loss_fused(x, s):
        y = fused_rms_norm(x, s, ATTN_EPS, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_xla(x, s):
        return jnp.sum(_xla_rms(x, s, ATTN_EPS).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, scale)
    gx = jax.grad(loss_xla, argnums=(0, 1))(x, scale)
    # fused bwd runs fp32 end-to-end; XLA autodiff differentiates the
    # bf16 op chain — a few elements land on different bf16 ulps
    np.testing.assert_allclose(np.asarray(gf[0], np.float32),
                               np.asarray(gx[0], np.float32),
                               atol=1e-1, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gx[1]),
                               atol=0.5, rtol=2e-2)


def test_support_gate():
    x = jnp.zeros((4, 256, 768))
    assert fused_rms_norm_supported(x, jnp.ones((768,)))
    assert not fused_rms_norm_supported(x, jnp.ones((769,)))        # mismatch
    assert not fused_rms_norm_supported(jnp.zeros((4, 100)), jnp.ones((100,)))  # D%128
    assert not fused_rms_norm_supported(jnp.zeros((2, 16, 768)), jnp.ones((768,)))  # tiny
    assert not fused_rms_norm_supported(jnp.zeros((768,)), jnp.ones((768,)))  # 1-D
