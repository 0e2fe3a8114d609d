"""IO tests: EXR codec roundtrip, H5 roundtrip + padding, tone mappers."""

import numpy as np
import pytest

from renderformer_tpu.io.h5 import (
    SceneFolderDataset, list_scene_files, load_scene_h5, save_scene_h5)
from renderformer_tpu.io.image import read_exr, write_exr, write_video
from renderformer_tpu.utils.tone_map import ToneMapper


@pytest.mark.parametrize('compression', ['none', 'zips', 'zip'])
def test_exr_roundtrip(tmp_path, compression):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 50, (17, 23, 3))).astype(np.float32)
    p = str(tmp_path / 'x.exr')
    write_exr(p, img, compression=compression)
    back = read_exr(p)
    np.testing.assert_array_equal(back, img)


def test_exr_zip_compresses_rendered_images(tmp_path):
    """ZIP must be lossless AND actually shrink smooth HDR images (the
    round-1 uncompressed writer cost ~3 MB/frame at 512^2)."""
    import os
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.stack([yy / 64, xx / 64, (yy + xx) / 128], axis=-1) * 10.0
    p_zip = str(tmp_path / 'z.exr')
    p_raw = str(tmp_path / 'r.exr')
    write_exr(p_zip, img, compression='zip')
    write_exr(p_raw, img, compression='none')
    np.testing.assert_array_equal(read_exr(p_zip), img)
    assert os.path.getsize(p_zip) < 0.5 * os.path.getsize(p_raw)


def test_exr_zip_incompressible_blocks_stored_raw(tmp_path):
    """Random noise doesn't deflate; blocks must fall back to raw storage
    per the OpenEXR spec and still round-trip."""
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (33, 31, 3)).astype(np.float32)  # odd sizes
    p = str(tmp_path / 'n.exr')
    write_exr(p, img, compression='zip')
    np.testing.assert_array_equal(read_exr(p), img)


def test_h5_roundtrip_and_padding(tmp_path):
    rng = np.random.default_rng(1)
    n = 10
    p = str(tmp_path / 's.h5')
    save_scene_h5(p,
                  rng.normal(size=(n, 3, 3)),
                  rng.normal(size=(n, 3, 3)),
                  rng.uniform(0, 1, (n, 13, 32, 32)),
                  np.tile(np.eye(4), (2, 1, 1)),
                  np.array([40.0, 35.0]))
    d = load_scene_h5(p)
    assert d['triangles'].shape == (n, 3, 3)
    assert d['mask'].all() and d['mask'].shape == (n,)
    assert d['fov'].shape == (2,)

    d2 = load_scene_h5(p, padding_length=16)
    assert d2['triangles'].shape == (16, 3, 3)
    assert d2['mask'].sum() == n
    np.testing.assert_allclose(d2['triangles'][:n], d['triangles'], atol=1e-6)
    assert (d2['triangles'][n:] == 0).all()

    with pytest.raises(ValueError):
        load_scene_h5(p, padding_length=4)


def test_scene_folder_natural_sort(tmp_path):
    for name in ['f10.h5', 'f2.h5', 'f1.h5']:
        save_scene_h5(str(tmp_path / name),
                      np.zeros((1, 3, 3)), np.zeros((1, 3, 3)),
                      np.zeros((1, 13, 32, 32)),
                      np.eye(4)[None], np.array([40.0]))
    files = list_scene_files(str(tmp_path))
    names = [f.split('/')[-1] for f in files]
    assert names == ['f1.h5', 'f2.h5', 'f10.h5']

    ds = SceneFolderDataset(str(tmp_path), padding_length=4)
    batches = list(ds.batches(2))
    assert len(batches) == 2
    assert batches[0]['triangles'].shape == (2, 4, 3, 3)
    assert batches[1]['triangles'].shape == (1, 4, 3, 3)


def test_video_writer(tmp_path):
    frames = [(np.random.rand(32, 32, 3) * 255).astype(np.uint8)
              for _ in range(5)]
    p = str(tmp_path / 'v.mp4')
    write_video(p, frames, fps=24)
    import os
    assert os.path.getsize(p) > 100


@pytest.mark.parametrize('name', ['agx', 'filmic', 'pbr_neutral'])
def test_tone_mappers(name):
    tm = ToneMapper(name)
    rng = np.random.default_rng(0)
    hdr = rng.uniform(0, 100, (8, 8, 3)).astype(np.float32)
    ldr = tm.hdr_to_ldr(hdr)
    assert ldr.shape == hdr.shape
    assert ldr.min() >= 0.0 and ldr.max() <= 1.0
    # monotone-ish: brighter input -> brighter output (per-pixel luminance)
    a = tm.hdr_to_ldr(np.full((1, 1, 3), 0.1, np.float32))
    b = tm.hdr_to_ldr(np.full((1, 1, 3), 1.0, np.float32))
    c = tm.hdr_to_ldr(np.full((1, 1, 3), 10.0, np.float32))
    assert a.mean() < b.mean() <= c.mean() + 1e-6
    # black maps to (near) black
    assert tm.hdr_to_ldr(np.zeros((1, 1, 3), np.float32)).max() < 0.1


def test_tone_mapper_unknown():
    with pytest.raises(ValueError):
        ToneMapper('reinhard')
