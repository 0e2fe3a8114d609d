"""render_many (K camera chunks per device program, the video dispatch
amortization — VERDICT r3 next #5) must match per-chunk render() exactly
up to fp order."""

import numpy as np
import pytest

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline

TINY = dict(
    latent_dim=72, num_layers=1, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64])


def test_render_many_matches_render():
    pipe = RenderingPipeline.from_config(RenderFormerConfig(**TINY))
    rng = np.random.default_rng(0)
    n, v, k = 16, 2, 3
    tris = rng.normal(size=(1, n, 3, 3)).astype(np.float32) * 0.3
    tex = rng.uniform(0, 1, (1, n, 13, 32, 32)).astype(np.float32)
    mask = np.ones((1, n), bool)
    vn = rng.normal(size=(1, n, 3, 3)).astype(np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (k, 1, v, 1, 1))
    c2w[..., 2, 3] = 2.0
    c2w[..., 0, 3] = np.linspace(-0.2, 0.2, k)[:, None, None]
    fov = np.full((k, 1, v, 1), 40.0, np.float32)

    many = np.asarray(pipe.render_many(
        tris, tex, mask, vn, c2w, fov, resolution=32, precision='fp32'))
    assert many.shape == (k, 1, v, 32, 32, 3)

    for i in range(k):
        one = np.asarray(pipe.render(
            tris, tex, mask, vn, c2w[i], fov[i],
            resolution=32, precision='fp32'))
        np.testing.assert_allclose(many[i], one, rtol=2e-4, atol=2e-5)


def test_render_many_sharded_raises():
    pipe = RenderingPipeline.from_config(RenderFormerConfig(**TINY))
    pipe.use_mesh((4, 2))  # conftest's 8 virtual CPU devices
    with pytest.raises(NotImplementedError):
        pipe.render_many(
            np.zeros((1, 4, 3, 3), np.float32),
            np.zeros((1, 4, 13, 32, 32), np.float32),
            np.ones((1, 4), bool),
            np.zeros((1, 4, 3, 3), np.float32),
            np.tile(np.eye(4, dtype=np.float32), (2, 1, 1, 1, 1)),
            np.full((2, 1, 1, 1), 40.0, np.float32))
