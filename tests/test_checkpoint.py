"""Checkpoint subsystem: orbax train-state round trip, inference export /
import round trip, format auto-detection in from_pretrained."""

import numpy as np
import jax
import jax.numpy as jnp

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.models.renderformer import RenderFormer
from renderformer_tpu.training.checkpoint import (
    export_params, import_params, load_checkpoint, save_checkpoint)
from renderformer_tpu.training.state import (
    TrainConfig, TrainState, make_optimizer)

TINY = dict(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64],
)


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_state_roundtrip(tmp_path):
    cfg = RenderFormerConfig(**TINY)
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(0))
    tx = make_optimizer(TrainConfig())
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(7, jnp.int32))

    path = save_checkpoint(str(tmp_path), 'best', state, cfg,
                           extra={'epoch': 3, 'train_losses': [1.0, 0.5]})
    restored, meta = load_checkpoint(path, state)
    _trees_equal(restored.params, state.params)
    _trees_equal(restored.opt_state, state.opt_state)
    assert int(restored.step) == 7
    assert meta['extra']['epoch'] == 3
    assert meta['model_config']['latent_dim'] == 72


def test_export_import_roundtrip(tmp_path):
    cfg = RenderFormerConfig(**TINY)
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(1))
    path = str(tmp_path / 'export')
    export_params(path, params, cfg)

    cfg2, params2 = import_params(path)
    assert cfg2 == cfg
    _trees_equal(params2, params)


def test_from_pretrained_detects_jax_format(tmp_path):
    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline
    cfg = RenderFormerConfig(**TINY)
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(2))
    path = str(tmp_path / 'ckpt')
    export_params(path, params, cfg)
    pipe = RenderingPipeline.from_pretrained(path)
    assert pipe.config == cfg
    _trees_equal(pipe.params, params)
