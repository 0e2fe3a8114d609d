"""Pallas flash-attention parity vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU). Forward and gradients, masked
and unmasked, self- and cross-shaped (SURVEY.md §4 item 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderformer_tpu.nn.attention import sdpa_xla
from renderformer_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, b, h, sq, sk, d, dtype=jnp.float32):
    """[B, S, H, D] sequence-major layout (matches the projections)."""
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, sk, h, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, sk, h, d)), dtype)
    return q, k, v


@pytest.mark.parametrize('sq,sk', [(64, 64), (128, 80), (96, 256)])
def test_forward_parity_masked(sq, sk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q, k, v = _rand_qkv(rng, b, h, sq, sk, d)
    mask = jnp.asarray(rng.uniform(size=(b, sk)) > 0.3)
    mask = mask.at[:, 0].set(True)  # at least one valid key

    want = sdpa_xla(q, k, v, mask[:, None, None, :])
    got = flash_attention(q, k, v, mask, bq=64, bk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_forward_parity_unmasked():
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, 1, 2, 128, 128, 32)
    want = sdpa_xla(q, k, v, None)
    got = flash_attention(q, k, v, None, bq=64, bk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_xla():
    rng = np.random.default_rng(2)
    b, h, sq, sk, d = 1, 2, 64, 96, 32
    q, k, v = _rand_qkv(rng, b, h, sq, sk, d)
    mask = jnp.asarray(rng.uniform(size=(b, sk)) > 0.3).at[:, 0].set(True)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(
            flash_attention(q, k, v, mask, bq=64, bk=64, interpret=True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(sdpa_xla(q, k, v, mask[:, None, None, :])))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_bf16_forward():
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 1, 2, 128, 144, 64, dtype=jnp.bfloat16)
    mask = jnp.ones((1, 144), bool).at[:, 100:].set(False)
    want = sdpa_xla(q, k, v, mask[:, None, None, :])
    got = flash_attention(q, k, v, mask, bq=64, bk=64, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_model_forward_flash_vs_xla():
    """Whole-model forward with impl='flash' (interpret) vs impl='xla'."""
    from renderformer_tpu.config import RenderFormerConfig
    from renderformer_tpu.models.renderformer import RenderFormer

    cfg = RenderFormerConfig(
        latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
        num_register_tokens=4, vertex_pe_num_freqs=4,
        view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
        view_transformer_n_heads=2, view_transformer_n_layers=4,
        dpt_features=16, dpt_out_channels=[8, 16, 32, 64])
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b, n, v, res = 1, 8, 1, 32
    args = (
        jnp.asarray(rng.normal(size=(b, n, 9)), jnp.float32) * 0.3,
        jnp.asarray(rng.uniform(0, 1, (b, n, 13, 32, 32)), jnp.float32),
        jnp.ones((b, n), bool).at[:, 6:].set(False),
        jnp.asarray(rng.normal(size=(b, n, 9)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, res, res, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, n, 9)), jnp.float32) * 0.3,
    )
    out_xla = np.asarray(model(params, *args, impl='xla'))
    out_flash = np.asarray(model(params, *args, impl='flash'))
    np.testing.assert_allclose(out_flash, out_xla, atol=5e-5, rtol=1e-4)


def test_rope_fused_kernel_matches_unfused():
    """RoPE-fused flash forward == rotate-then-attend, fwd and grads."""
    from renderformer_tpu.encodings.rope import apply_rope, make_cos_sin
    from renderformer_tpu.ops.flash_attention import flash_attention_rope

    rng = np.random.default_rng(7)
    b, h, sq, sk, d = 1, 2, 96, 80, 128
    q, k, v = _rand_qkv(rng, b, h, sq, sk, d)
    mask = jnp.asarray(rng.uniform(size=(b, sk)) > 0.3).at[:, 0].set(True)
    pos_q = jnp.asarray(rng.normal(size=(b, sq, 9)), jnp.float32) * 0.3
    pos_k = jnp.asarray(rng.normal(size=(b, sk, 9)), jnp.float32) * 0.3
    cq, sq_ = make_cos_sin(pos_q, rope_dim=12, head_dim=d)
    ck, sk_ = make_cos_sin(pos_k, rope_dim=12, head_dim=d)

    def loss_unfused(q, k, v):
        qr = apply_rope(q, cq, sq_)
        kr = apply_rope(k, ck, sk_)
        return jnp.sum(jnp.square(sdpa_xla(qr, kr, v, mask[:, None, None, :])))

    def loss_fused(q, k, v):
        out = flash_attention_rope(q, k, v, mask, cq, sq_, ck, sk_,
                                   bq=64, bk=64, interpret=True)
        return jnp.sum(jnp.square(out))

    np.testing.assert_allclose(float(loss_fused(q, k, v)),
                               float(loss_unfused(q, k, v)), rtol=1e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_unfused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_rope_fused_model_forward(monkeypatch):
    """Whole model with RFTPU_FUSE_ROPE=1 matches the default path."""
    import os
    from renderformer_tpu.config import RenderFormerConfig
    from renderformer_tpu.models.renderformer import RenderFormer

    cfg = RenderFormerConfig(
        latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
        num_register_tokens=4, vertex_pe_num_freqs=4,
        view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
        view_transformer_n_heads=2, view_transformer_n_layers=4,
        dpt_features=16, dpt_out_channels=[8, 16, 32, 64])
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b, n, v, res = 1, 8, 1, 32
    args = (
        jnp.asarray(rng.normal(size=(b, n, 9)), jnp.float32) * 0.3,
        jnp.asarray(rng.uniform(0, 1, (b, n, 13, 32, 32)), jnp.float32),
        jnp.ones((b, n), bool).at[:, 6:].set(False),
        jnp.asarray(rng.normal(size=(b, n, 9)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, res, res, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, v, n, 9)), jnp.float32) * 0.3,
    )
    base = np.asarray(model(params, *args, impl='flash'))
    monkeypatch.setenv('RFTPU_FUSE_ROPE', '1')
    fused = np.asarray(model(params, *args, impl='flash'))
    np.testing.assert_allclose(fused, base, atol=5e-5, rtol=1e-4)


def test_fused_bwd_matches_twokernel():
    """The fused single-pass backward (default) must produce the same
    dq/dk/dv as the two-kernel design, including ragged padding + mask."""
    from renderformer_tpu.ops.flash_attention import (
        _flash_bwd_fused, _flash_bwd_twokernel, _flash_fwd)
    rng = np.random.default_rng(5)
    for (b, h, sq, sk, d, masked) in [
            (1, 2, 64, 96, 32, True),
            (2, 2, 100, 70, 32, True),   # ragged: padding in q and k
            (1, 1, 128, 128, 64, False)]:
        q, k, v = _rand_qkv(rng, b, h, sq, sk, d)
        mask = (jnp.asarray(rng.uniform(size=(b, sk)) > 0.3).at[:, 0]
                .set(True) if masked else None)
        do = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
        out, lse = _flash_fwd(q, k, v, mask, bq=64, bk=64, interpret=True,
                              with_lse=True)
        a = _flash_bwd_fused(q, k, v, mask, out, lse, do, 64, 64, True)
        b_ = _flash_bwd_twokernel(q, k, v, mask, out, lse, do, 64, 64, True)
        for ga, gb, name in zip(a, b_, ('dq', 'dk', 'dv')):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), atol=2e-5, rtol=1e-4,
                err_msg=f'{name} b{b} sq{sq} sk{sk} masked={masked}')


def test_rope_fused_per_scene_kv():
    """flash_attention_rope with per-scene K/V (batch Bkv dividing the
    q batch — the view fan-out) matches explicit broadcast, fwd and
    grads (including the per-scene cotangent reduction)."""
    from renderformer_tpu.encodings.rope import apply_rope, make_cos_sin
    from renderformer_tpu.ops.flash_attention import flash_attention_rope

    rng = np.random.default_rng(11)
    bkv, reps, h, sq, sk, d = 2, 3, 2, 64, 48, 128
    b = bkv * reps
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32) * 0.2
    k1 = jnp.asarray(rng.normal(size=(bkv, sk, h, d)), jnp.float32) * 0.2
    v1 = jnp.asarray(rng.normal(size=(bkv, sk, h, d)), jnp.float32) * 0.2
    # per-scene key-padding mask, view-major broadcast to the q batch
    mask1 = jnp.asarray(rng.uniform(size=(bkv, sk)) > 0.3).at[:, 0].set(True)
    mask = jnp.repeat(mask1, reps, axis=0)
    pos_q = jnp.asarray(rng.normal(size=(b, sq, 9)), jnp.float32) * 0.3
    pos_k = jnp.asarray(rng.normal(size=(b, sk, 9)), jnp.float32) * 0.3
    cq, sq_ = make_cos_sin(pos_q, rope_dim=12, head_dim=d)
    ck, sk_ = make_cos_sin(pos_k, rope_dim=12, head_dim=d)

    def bcast(x):
        return jnp.repeat(x, reps, axis=0)

    def loss_ref(k_, v_):
        qr = apply_rope(q, cq, sq_)
        kr = apply_rope(bcast(k_), ck, sk_)
        return jnp.sum(jnp.square(
            sdpa_xla(qr, kr, bcast(v_), mask[:, None, None, :])))

    def loss_kernel(k_, v_):
        out = flash_attention_rope(q, k_, v_, mask, cq, sq_, ck, sk_,
                                   bq=64, bk=64, interpret=True)
        return jnp.sum(jnp.square(out))

    np.testing.assert_allclose(float(loss_kernel(k1, v1)),
                               float(loss_ref(k1, v1)), rtol=1e-5)
    gk = jax.grad(loss_kernel, argnums=(0, 1))(k1, v1)
    gr = jax.grad(loss_ref, argnums=(0, 1))(k1, v1)
    for a, b_ in zip(gk, gr):
        assert a.shape == (bkv, sk, h, d)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)
