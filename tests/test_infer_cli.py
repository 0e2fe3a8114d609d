"""End-to-end smoke of the single-scene infer CLI (reference infer.py):
tiny exported checkpoint + synthetic H5 scene -> per-view EXR/PNG with a
tone mapper — the user's first-contact path."""

import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from renderformer_tpu.config import RenderFormerConfig

TINY = RenderFormerConfig(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64])


def test_infer_cli_end_to_end(tmp_path, monkeypatch):
    import jax
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.training.checkpoint import export_params

    ckpt_dir = str(tmp_path / 'ckpt')
    model = RenderFormer(TINY)
    export_params(ckpt_dir, model.init(jax.random.key(0)), TINY)

    h5_file = str(tmp_path / 'scene.h5')
    rng = np.random.default_rng(0)
    n_tris, n_views = 12, 2
    with h5py.File(h5_file, 'w') as f:
        f['triangles'] = rng.normal(size=(n_tris, 3, 3)).astype(np.float32) * 0.3
        f['texture'] = rng.uniform(
            0, 1, (n_tris, 13, 32, 32)).astype(np.float16)
        f['vn'] = rng.normal(size=(n_tris, 3, 3)).astype(np.float32)
        f['c2w'] = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
        f['fov'] = np.full((n_views,), 40.0, np.float32)

    out_dir = str(tmp_path / 'out')
    monkeypatch.setattr(sys, 'argv', [
        'infer.py', '--h5_file', h5_file, '--model_id', ckpt_dir,
        '--precision', 'fp32', '--resolution', '32',
        '--output_dir', out_dir, '--tone_mapper', 'agx',
        '--attn_impl', 'xla'])
    import infer
    assert not infer.main()

    exrs = sorted(f for f in os.listdir(out_dir) if f.endswith('.exr'))
    pngs = sorted(f for f in os.listdir(out_dir) if f.endswith('.png'))
    assert len(exrs) == n_views and len(pngs) == n_views

    from renderformer_tpu.io.image import read_exr
    img = read_exr(os.path.join(out_dir, exrs[0]))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
