"""Precision-policy quality gates: the bf16 fast path must stay within
PSNR tolerance of the fp32 reference path (SURVEY.md §7.3 — bound bf16
drift at PSNR level, not bitwise)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.models.renderformer import RenderFormer

TINY = dict(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64],
)


def _psnr(a, b, peak=None):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float('inf')
    peak = peak or max(float(np.abs(a).max()), 1e-6)
    return 10 * np.log10(peak ** 2 / mse)


@pytest.fixture(scope='module')
def model_and_inputs():
    model = RenderFormer(RenderFormerConfig(**TINY))
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b, n, v, res = 1, 16, 2, 64
    args = (
        jnp.asarray(rng.normal(size=(b, n, 9)), jnp.float32) * 0.3,
        jnp.asarray(rng.uniform(0, 1, (b, n, 13, 32, 32)), jnp.float32),
        jnp.ones((b, n), bool).at[:, 12:].set(False),
        jnp.asarray(rng.normal(size=(b, n, 9)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, res, res, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, n, 9)), jnp.float32) * 0.3,
    )
    return model, params, args


def test_bf16_stage1_psnr(model_and_inputs):
    """bf16 stage 1 + fp32 stage 2 (the production default)."""
    model, params, args = model_and_inputs
    ref = np.asarray(model(params, *args,
                           dtype=jnp.float32, view_dtype=jnp.float32))
    fast = np.asarray(model(params, *args,
                            dtype=jnp.bfloat16, view_dtype=jnp.float32))
    psnr = _psnr(fast, ref)
    assert psnr > 40, f'bf16-stage1 PSNR too low: {psnr:.1f} dB'


def test_bf16_full_psnr(model_and_inputs):
    """all-bf16 (bench configuration) stays render-quality close."""
    model, params, args = model_and_inputs
    ref = np.asarray(model(params, *args,
                           dtype=jnp.float32, view_dtype=jnp.float32))
    fast = np.asarray(model(params, *args,
                            dtype=jnp.bfloat16, view_dtype=jnp.bfloat16))
    psnr = _psnr(fast, ref)
    assert psnr > 30, f'all-bf16 PSNR too low: {psnr:.1f} dB'
