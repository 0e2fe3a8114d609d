"""End-to-end smoke of the batch_infer CLI (reference batch_infer.py):
tiny exported checkpoint + synthetic per-frame H5 scenes -> EXR/PNG/MP4,
exercising the prefetch + pipelined-dispatch + async-writer overlap path.
"""

import os
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from renderformer_tpu.config import RenderFormerConfig


TINY = RenderFormerConfig(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64])


def _write_scene(path, n_tris, n_views, seed):
    rng = np.random.default_rng(seed)
    with h5py.File(path, 'w') as f:
        f['triangles'] = rng.normal(size=(n_tris, 3, 3)).astype(np.float32) * 0.3
        f['texture'] = rng.uniform(
            0, 1, (n_tris, 13, 32, 32)).astype(np.float16)
        f['vn'] = rng.normal(size=(n_tris, 3, 3)).astype(np.float32)
        f['c2w'] = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
        f['fov'] = np.full((n_views,), 40.0, np.float32)


def test_batch_infer_cli_end_to_end(tmp_path, monkeypatch):
    import jax
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.training.checkpoint import export_params

    ckpt_dir = str(tmp_path / 'ckpt')
    model = RenderFormer(TINY)
    export_params(ckpt_dir, model.init(jax.random.key(0)), TINY)

    h5_dir = tmp_path / 'frames'
    h5_dir.mkdir()
    n_frames = 3
    for i in range(n_frames):
        _write_scene(str(h5_dir / f'frame_{i:03d}.h5'), n_tris=8 + i,
                     n_views=1, seed=i)

    out_dir = str(tmp_path / 'out')
    monkeypatch.setattr(sys, 'argv', [
        'batch_infer.py', '--h5_folder', str(h5_dir),
        '--model_id', ckpt_dir, '--precision', 'fp32',
        '--resolution', '32', '--batch_size', '2',
        '--padding_length', '16', '--output_dir', out_dir,
        '--tone_mapper', 'pbr_neutral', '--attn_impl', 'xla'])
    import batch_infer
    assert not batch_infer.main()

    exrs = sorted(f for f in os.listdir(out_dir) if f.endswith('.exr'))
    pngs = sorted(f for f in os.listdir(out_dir) if f.endswith('.png'))
    assert len(exrs) == n_frames and len(pngs) == n_frames

    from renderformer_tpu.io.image import read_exr
    img = read_exr(os.path.join(out_dir, exrs[0]))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def test_batch_infer_video_mode_matches_generic(tmp_path, monkeypatch):
    """Static-scene video fast path (scene uploaded once, frames rendered
    as views of the device-resident scene) produces the same images as
    the per-frame generic path, including the padded remainder chunk."""
    import jax
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.training.checkpoint import export_params

    ckpt_dir = str(tmp_path / 'ckpt')
    model = RenderFormer(TINY)
    export_params(ckpt_dir, model.init(jax.random.key(0)), TINY)

    # one scene, camera varying per frame (the video workload shape)
    rng = np.random.default_rng(0)
    tris = rng.normal(size=(8, 3, 3)).astype(np.float32) * 0.3
    tex = rng.uniform(0, 1, (8, 13, 32, 32)).astype(np.float16)
    vn = rng.normal(size=(8, 3, 3)).astype(np.float32)
    h5_dir = tmp_path / 'frames'
    h5_dir.mkdir()
    n_frames = 3  # batch_size=2 -> one full chunk + one padded remainder
    for i in range(n_frames):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.05 * i
        with h5py.File(str(h5_dir / f'frame_{i:03d}.h5'), 'w') as f:
            f['triangles'], f['texture'], f['vn'] = tris, tex, vn
            f['c2w'] = c2w[None]
            f['fov'] = np.full((1,), 40.0, np.float32)

    import batch_infer
    outs = {}
    for mode in ('on', 'off'):
        out_dir = str(tmp_path / f'out_{mode}')
        monkeypatch.setattr(sys, 'argv', [
            'batch_infer.py', '--h5_folder', str(h5_dir),
            '--model_id', ckpt_dir, '--precision', 'fp32',
            '--resolution', '32', '--batch_size', '2',
            '--padding_length', '8', '--output_dir', out_dir,
            '--attn_impl', 'xla', '--video_mode', mode,
            '--transfer_dtype', 'float32'])
        assert not batch_infer.main()
        from renderformer_tpu.io.image import read_exr
        outs[mode] = [
            read_exr(os.path.join(out_dir, f'frame_{i:03d}_view_0.exr'))
            for i in range(n_frames)]
    for a, b in zip(outs['on'], outs['off']):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_batch_infer_no_output(tmp_path, monkeypatch):
    """--no_output benchmark mode runs the render loop without writing
    any image files."""
    import jax
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.training.checkpoint import export_params

    ckpt_dir = str(tmp_path / 'ckpt')
    model = RenderFormer(TINY)
    export_params(ckpt_dir, model.init(jax.random.key(0)), TINY)
    h5_dir = tmp_path / 'frames'
    h5_dir.mkdir()
    for i in range(2):
        _write_scene(str(h5_dir / f'frame_{i:03d}.h5'), n_tris=8,
                     n_views=1, seed=0)  # same seed -> static scene
    out_dir = str(tmp_path / 'out')
    monkeypatch.setattr(sys, 'argv', [
        'batch_infer.py', '--h5_folder', str(h5_dir),
        '--model_id', ckpt_dir, '--precision', 'fp32',
        '--resolution', '32', '--batch_size', '2',
        '--output_dir', out_dir, '--attn_impl', 'xla', '--no_output'])
    import batch_infer
    assert not batch_infer.main()
    assert not [f for f in os.listdir(out_dir) if f.endswith('.exr')]
