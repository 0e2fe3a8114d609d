"""Golden parity on real Cornell-box geometry: the in-repo cbox example
(~1.5k triangles) converted by the scene pipeline, rendered by both the
torch reference and this framework with converted random weights, fp32,
through the respective *pipeline* code paths (HDR codec + camera
transform + ray generation + model)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from conftest import import_reference  # noqa: E402

import_reference()

from renderformer.models.config import RenderFormerConfig as TorchConfig  # noqa: E402
from renderformer.models.renderformer import RenderFormer as TorchRenderFormer  # noqa: E402
from renderformer.utils.ray_generator import RayGenerator  # noqa: E402

from renderformer_tpu.config import RenderFormerConfig  # noqa: E402
from renderformer_tpu.convert.torch_to_jax import convert_torch_model  # noqa: E402
from renderformer_tpu.models.renderformer import RenderFormer  # noqa: E402
from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline  # noqa: E402

TINY = dict(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64],
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _torch_pipeline_render(tmodel, data, res):
    """Reference rendering_pipeline.render re-stated without roma
    (rendering_pipeline.py:28-125; the rigid inverse is computed
    directly)."""
    triangles = torch.from_numpy(data['triangles'])[None]
    texture = torch.from_numpy(data['texture'])[None].clone()
    mask = torch.from_numpy(data['mask'])[None]
    vn = torch.from_numpy(data['vn'])[None]
    c2w = torch.from_numpy(data['c2w'])[None]
    fov = torch.from_numpy(data['fov'])[None, :, None]
    bs, nv = c2w.shape[0], c2w.shape[1]

    texture[:, :, -3:] = torch.log10(texture[:, :, -3:] + 1.0)

    c2w_flat = c2w.reshape(-1, 4, 4)
    R = c2w_flat[:, :3, :3]
    t = c2w_flat[:, :3, 3]
    tris_rep = torch.repeat_interleave(triangles, nv, dim=0)
    tris_view = torch.einsum('bnvj,bji->bnvi', tris_rep - t[:, None, None, :], R)
    tris_view = tris_view.reshape(bs, nv, -1, 3, 3)
    eye = torch.eye(4).repeat(bs * nv, 1, 1).reshape(bs, nv, 4, 4)

    rays_o, rays_d = RayGenerator()(eye, fov / 180.0 * torch.pi, res)
    with torch.no_grad():
        out = tmodel(
            triangles.reshape(bs, -1, 9), texture, mask,
            vn.reshape(bs, -1, 9), rays_o=rays_o, rays_d=rays_d,
            tri_vpos_view_tf=tris_view.reshape(bs, nv, -1, 9))
    out = out.permute(0, 1, 3, 4, 2)
    return (torch.pow(10.0, out) - 1.0).numpy()


@pytest.mark.slow
def test_cbox_pipeline_parity(tmp_path):
    examples = os.path.join(REPO, 'examples')
    if not os.path.isdir(examples):
        pytest.skip('examples not generated')

    from renderformer_tpu.scene.scene_config import load_scene_config
    from renderformer_tpu.scene.scene_mesh import generate_scene_meshes
    from renderformer_tpu.scene.to_h5 import scene_to_tensors
    cfg_scene = load_scene_config(os.path.join(examples, 'cbox.json'))
    meshes = generate_scene_meshes(cfg_scene, examples)
    t = scene_to_tensors(cfg_scene, meshes)
    data = {
        'triangles': t['triangles'],
        'texture': t['texture'].astype(np.float32),
        'mask': np.ones(t['triangles'].shape[0], bool),
        'vn': t['vn'],
        'c2w': t['c2w'],
        'fov': t['fov'],
    }

    res = 64
    torch.manual_seed(0)
    tmodel = TorchRenderFormer(TorchConfig(**TINY)).eval()
    want = _torch_pipeline_render(tmodel, data, res)

    params = convert_torch_model(tmodel)
    model = RenderFormer(RenderFormerConfig(**TINY))
    pipe = RenderingPipeline(model, params)
    got = np.asarray(pipe.render(
        data['triangles'][None], data['texture'][None], data['mask'][None],
        data['vn'][None], data['c2w'][None], data['fov'][None, :, None],
        resolution=res, precision='fp32', view_precision='fp32'))

    assert got.shape == want.shape == (1, 1, res, res, 3)
    # HDR decode amplifies absolute error; compare in PSNR terms
    mse = float(np.mean((got - want) ** 2))
    peak = max(float(np.abs(want).max()), 1e-6)
    psnr = 10 * np.log10(peak ** 2 / mse) if mse > 0 else np.inf
    assert psnr > 60, f'cbox pipeline parity PSNR too low: {psnr:.1f} dB'
