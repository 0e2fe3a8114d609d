"""Pipeline-level parity for config variants that change the PIPELINE
rather than the model: ``use_ldr=True`` (HDR log codec skipped on both
ends, /root/reference/pipelines/rendering_pipeline.py:66-68,121-123) and
``texture_encode_patch_size=1`` (the [B,N,13,1,1] -> [B,N,13] squeeze,
rendering_pipeline.py:63-64). VERDICT r2 missing #5."""

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
from renderformer_tpu.pipelines.rendering_pipeline import render_fn  # noqa: E402

TINY = dict(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64],
)


def _make_scene(seed=0, n=24, nv=1, patch_size=32):
    rng = np.random.default_rng(seed)
    c2w = np.tile(np.eye(4, dtype=np.float32), (nv, 1, 1))
    c2w[:, 2, 3] = 2.0
    return dict(
        triangles=rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.3,
        texture=rng.uniform(
            0, 1, (n, 13, patch_size, patch_size)).astype(np.float32),
        mask=np.ones(n, bool),
        vn=rng.normal(size=(n, 3, 3)).astype(np.float32),
        c2w=c2w,
        fov=np.full((nv,), 40.0, np.float32),
    )


def _torch_pipeline_render(tmodel, data, res):
    """Reference rendering_pipeline.render re-stated without roma
    (rendering_pipeline.py:28-125), honoring use_ldr and the
    patch-size-1 squeeze."""
    cfg = tmodel.config
    triangles = torch.from_numpy(data['triangles'])[None]
    texture = torch.from_numpy(data['texture'])[None].clone()
    mask = torch.from_numpy(data['mask'])[None]
    vn = torch.from_numpy(data['vn'])[None]
    c2w = torch.from_numpy(data['c2w'])[None]
    fov = torch.from_numpy(data['fov'])[None, :, None]
    bs, nv = c2w.shape[0], c2w.shape[1]

    if cfg.texture_encode_patch_size == 1:
        texture = texture.squeeze(-1).squeeze(-1)  # :63-64
    if not cfg.use_ldr:
        texture[:, :, -3:] = torch.log10(texture[:, :, -3:] + 1.0)  # :66-68

    c2w_flat = c2w.reshape(-1, 4, 4)
    R = c2w_flat[:, :3, :3]
    t = c2w_flat[:, :3, 3]
    tris_rep = torch.repeat_interleave(triangles, nv, dim=0)
    tris_view = torch.einsum(
        'bnvj,bji->bnvi', tris_rep - t[:, None, None, :], R)
    tris_view = tris_view.reshape(bs, nv, -1, 3, 3)
    eye = torch.eye(4).repeat(bs * nv, 1, 1).reshape(bs, nv, 4, 4)

    rays_o, rays_d = RayGenerator()(eye, fov / 180.0 * torch.pi, res)
    with torch.no_grad():
        out = tmodel(
            triangles.reshape(bs, -1, 9), texture, mask,
            vn.reshape(bs, -1, 9), rays_o=rays_o, rays_d=rays_d,
            tri_vpos_view_tf=tris_view.reshape(bs, nv, -1, 9))
    out = out.permute(0, 1, 3, 4, 2)
    if not cfg.use_ldr:
        out = torch.pow(10.0, out) - 1.0  # :121-123
    return out.numpy()


def _run_pipeline_parity(overrides, res=32, seed=0):
    cfg_kw = dict(TINY, **overrides)
    ps = cfg_kw.get('texture_encode_patch_size', 32)
    data = _make_scene(seed=seed, patch_size=ps)

    torch.manual_seed(seed)
    tmodel = TorchRenderFormer(TorchConfig(**cfg_kw)).eval()
    want = _torch_pipeline_render(tmodel, data, res)

    params = convert_torch_model(tmodel)
    model = RenderFormer(RenderFormerConfig(**cfg_kw))
    got = np.asarray(render_fn(
        params,
        jnp.asarray(data['triangles'])[None], jnp.asarray(data['texture'])[None],
        jnp.asarray(data['mask'])[None], jnp.asarray(data['vn'])[None],
        jnp.asarray(data['c2w'])[None], jnp.asarray(data['fov'])[None, :, None],
        model=model, resolution=res,
        dtype=jnp.float32, view_dtype=jnp.float32, impl='xla'))

    assert got.shape == want.shape
    mse = float(np.mean((got - want) ** 2))
    peak = max(float(np.abs(want).max()), 1e-6)
    psnr = 10 * np.log10(peak ** 2 / mse) if mse > 0 else np.inf
    assert psnr > 60, f'pipeline parity PSNR too low: {psnr:.1f} dB'


def test_pipeline_parity_use_ldr():
    """use_ldr=True: no log10 on emissive channels in, no pow(10,.)-1
    out — raw model output is the image."""
    _run_pipeline_parity({'use_ldr': True})


def test_pipeline_parity_patch_size_1():
    """texture_encode_patch_size=1: the pipeline squeezes [B,N,13,1,1]
    textures to [B,N,13] before the texture encoder."""
    _run_pipeline_parity({'texture_encode_patch_size': 1})


def test_pipeline_parity_use_ldr_and_patch1():
    _run_pipeline_parity({'use_ldr': True, 'texture_encode_patch_size': 1})
