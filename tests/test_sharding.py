"""Distributed-correctness tests on an 8-device virtual CPU mesh:
sharded execution must match single-device execution (SURVEY.md §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial
from jax.sharding import NamedSharding, PartitionSpec as P

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.models.renderformer import RenderFormer
from renderformer_tpu.parallel.sharding import (
    make_mesh, replicated, use_sharding)
from renderformer_tpu.pipelines.rendering_pipeline import render_fn
from renderformer_tpu.training.state import (
    TrainConfig, TrainState, make_optimizer, make_train_step)

TINY = dict(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64],
)


@pytest.fixture(scope='module')
def setup():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    cfg = RenderFormerConfig(**TINY)
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b, n, v, res = 4, 8, 2, 32
    batch = {
        'triangles': jnp.asarray(rng.normal(size=(b, n, 3, 3)), jnp.float32) * 0.3,
        'texture': jnp.asarray(rng.uniform(0, 1, (b, n, 13, 32, 32)), jnp.float32),
        'mask': jnp.ones((b, n), bool),
        'vn': jnp.asarray(rng.normal(size=(b, n, 3, 3)), jnp.float32),
        'c2w': jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))),
        'fov': jnp.full((b, v, 1), 40.0, jnp.float32),
        'gt': jnp.asarray(rng.uniform(0, 1, (b, v, res, res, 3)), jnp.float32),
    }
    return model, params, batch, res


def test_sharded_render_matches_single_device(setup):
    model, params, batch, res = setup
    fn = partial(render_fn, model=model, resolution=res,
                 dtype=jnp.float32, view_dtype=jnp.float32, impl='xla')
    args = (params, batch['triangles'], batch['texture'], batch['mask'],
            batch['vn'], batch['c2w'], batch['fov'])

    single = np.asarray(jax.jit(fn)(*args))

    mesh = make_mesh((4, 2))
    repl = replicated(mesh)
    data_sh = NamedSharding(mesh, P('data'))
    sh_args = (jax.device_put(params, repl),) + tuple(
        jax.device_put(a, data_sh) for a in args[1:])
    with use_sharding(mesh):
        sharded = np.asarray(jax.jit(fn)(*sh_args))

    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(setup):
    model, params, batch, res = setup
    tc = TrainConfig(resolution=res, precision='float32',
                     view_precision='float32', steps_per_epoch=4)
    tx = make_optimizer(tc)
    train_step, _ = make_train_step(model, tx, tc, impl='xla')
    state = TrainState.create(params, tx)

    s1, m1 = jax.jit(train_step)(state, batch)
    loss1 = float(m1['loss'])

    mesh = make_mesh((4, 2))
    repl = replicated(mesh)
    data_sh = NamedSharding(mesh, P('data'))
    state_sh = jax.device_put(state, repl)
    batch_sh = jax.device_put(batch, data_sh)
    with use_sharding(mesh):
        s2, m2 = jax.jit(train_step, in_shardings=(repl, data_sh),
                         out_shardings=(repl, repl))(state_sh, batch_sh)
    loss2 = float(m2['loss'])

    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss2, loss1, rtol=1e-5)
    np.testing.assert_allclose(
        float(m2['grad_norm']), float(m1['grad_norm']), rtol=1e-4)
    # updated params must agree
    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4)


def test_ring_render_matches_single_device(setup):
    """Full model under sp_mode='ring': every MHA site whose shapes
    divide the ring runs ring attention; output must match exactly-ish."""
    model, params, batch, res = setup
    fn = partial(render_fn, model=model, resolution=res,
                 dtype=jnp.float32, view_dtype=jnp.float32, impl='xla')
    args = (params, batch['triangles'], batch['texture'], batch['mask'],
            batch['vn'], batch['c2w'], batch['fov'])

    single = np.asarray(jax.jit(fn)(*args))

    mesh = make_mesh((4, 2))
    repl = replicated(mesh)
    data_sh = NamedSharding(mesh, P('data'))
    sh_args = (jax.device_put(params, repl),) + tuple(
        jax.device_put(a, data_sh) for a in args[1:])
    with use_sharding(mesh, sp_mode='ring'):
        ringed = np.asarray(jax.jit(fn)(*sh_args))

    np.testing.assert_allclose(ringed, single, atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_ring_train_step_matches_single_device(setup):
    """Gradients through ring attention (ring-level custom VJP) must
    match single-device autodiff."""
    model, params, batch, res = setup
    tc = TrainConfig(resolution=res, precision='float32',
                     view_precision='float32', steps_per_epoch=4)
    tx = make_optimizer(tc)
    train_step, _ = make_train_step(model, tx, tc, impl='xla')
    state = TrainState.create(params, tx)

    _, m1 = jax.jit(train_step)(state, batch)

    mesh = make_mesh((4, 2))
    repl = replicated(mesh)
    data_sh = NamedSharding(mesh, P('data'))
    state_sh = jax.device_put(state, repl)
    batch_sh = jax.device_put(batch, data_sh)
    with use_sharding(mesh, sp_mode='ring'):
        _, m2 = jax.jit(train_step, in_shardings=(repl, data_sh),
                        out_shardings=(repl, repl))(state_sh, batch_sh)

    np.testing.assert_allclose(float(m2['loss']), float(m1['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m2['grad_norm']),
                               float(m1['grad_norm']), rtol=1e-4)


def test_pipeline_use_mesh_matches_unsharded(setup):
    """Public pipeline API: use_mesh() sharded render == unsharded."""
    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline
    model, params, batch, res = setup
    args = dict(triangles=batch['triangles'], texture=batch['texture'],
                mask=batch['mask'], vn=batch['vn'], c2w=batch['c2w'],
                fov=batch['fov'], resolution=res, precision='fp32',
                view_precision='fp32')
    p1 = RenderingPipeline(model, params)
    single = np.asarray(p1.render(**args))
    p2 = RenderingPipeline(model, params).use_mesh((4, 2))
    sharded = np.asarray(p2.render(**args))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-4)
