"""Gradient checkpointing (remat) correctness: loss and grads with
``remat=True`` must match ``remat=False`` (jax.checkpoint changes memory,
never values).  Covers the encoder, the plain decoder, and the Swin
decoder (the round-1 decoder remat path crashed on static args).

Reference behavior: /root/reference/train.py:302-305 enables torch
gradient checkpointing from configs/config.yml `use_gradient_checkpointing`.
"""

import dataclasses

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.models.renderformer import RenderFormer
from renderformer_tpu.training.state import TrainConfig, make_optimizer, make_train_step, TrainState

TINY = dict(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64],
)


def _inputs(rng, b=1, n=8, v=1, res=32):
    return dict(
        tri=rng.normal(size=(b, n, 9)).astype(np.float32) * 0.3,
        tex=rng.uniform(0, 1, (b, n, 13, 32, 32)).astype(np.float32),
        mask=np.ones((b, n), bool),
        vns=rng.normal(size=(b, n, 9)).astype(np.float32),
        rays_o=rng.normal(size=(b, v, 3)).astype(np.float32),
        rays_d=rng.normal(size=(b, v, res, res, 3)).astype(np.float32),
        tri_view=rng.normal(size=(b, v, n, 9)).astype(np.float32) * 0.3,
    )


def _loss_and_grads(model, params, x):
    def loss_fn(p):
        out = model(p, x['tri'], x['tex'], x['mask'], x['vns'],
                    x['rays_o'], x['rays_d'], x['tri_view'])
        return (out.astype(jnp.float32) ** 2).mean()
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return loss, grads


def _assert_remat_invariant(cfg_kw, res=32):
    rng = np.random.default_rng(7)
    x = _inputs(rng, res=res)
    cfg = RenderFormerConfig(**cfg_kw)
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(0))

    loss0, g0 = _loss_and_grads(model, params, x)
    loss1, g1 = _loss_and_grads(dataclasses.replace(model, remat=True),
                                params, x)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    for p0, p1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_remat_matches_no_remat():
    _assert_remat_invariant(TINY)


@pytest.mark.slow
def test_remat_matches_no_remat_swin():
    # swin windows are 8x8 patches -> needs a >=64^2 ray grid
    _assert_remat_invariant(
        dict(TINY, view_transformer_use_swin_attn=True), res=64)


@pytest.mark.slow
def test_train_step_remat_flag():
    """TrainConfig.remat flows through make_train_step and produces the
    same loss/grad-norm as the non-remat step."""
    rng = np.random.default_rng(11)
    b, n, v, res = 1, 8, 1, 32
    batch = {
        'triangles': rng.normal(size=(b, n, 3, 3)).astype(np.float32) * 0.3,
        'texture': rng.uniform(0, 1, (b, n, 13, 32, 32)).astype(np.float32),
        'mask': np.ones((b, n), bool),
        'vn': rng.normal(size=(b, n, 3, 3)).astype(np.float32),
        'c2w': np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1)),
        'fov': np.full((b, v, 1), 40.0, np.float32),
        'gt': rng.uniform(0, 1, (b, v, res, res, 3)).astype(np.float32),
    }
    batch['c2w'][..., 2, 3] = 2.0

    model = RenderFormer(RenderFormerConfig(**TINY))
    params = model.init(jax.random.key(1))

    metrics = {}
    for remat in (False, True):
        tc = TrainConfig(precision='float32', resolution=res, remat=remat)
        tx = make_optimizer(tc)
        step, _ = make_train_step(model, tx, tc, impl='xla')
        state = TrainState.create(params, tx)
        _, m = jax.jit(step)(state, batch)
        metrics[remat] = (float(m['loss']), float(m['grad_norm']))

    np.testing.assert_allclose(metrics[False][0], metrics[True][0], rtol=1e-6)
    np.testing.assert_allclose(metrics[False][1], metrics[True][1], rtol=1e-4)
