"""Gradient golden parity: d(loss)/d(inputs) and d(loss)/d(weights) vs
torch autograd on the reference model (BASELINE.json north star: "pixel
gradients w.r.t. triangle attributes match the PyTorch reference")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from conftest import import_reference  # noqa: E402

import_reference()

from renderformer.models.config import RenderFormerConfig as TorchConfig  # noqa: E402
from renderformer.models.renderformer import RenderFormer as TorchRenderFormer  # noqa: E402

from renderformer_tpu.config import RenderFormerConfig  # noqa: E402
from renderformer_tpu.convert.torch_to_jax import convert_torch_model  # noqa: E402
from renderformer_tpu.models.renderformer import RenderFormer  # noqa: E402

TINY = dict(
    latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
    num_register_tokens=4, vertex_pe_num_freqs=4,
    view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
    view_transformer_n_heads=2, view_transformer_n_layers=4,
    dpt_features=16, dpt_out_channels=[8, 16, 32, 64],
)


@pytest.mark.slow
def test_gradient_parity_texture_and_weights():
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    b, n, v, res = 1, 8, 1, 32

    tmodel = TorchRenderFormer(TorchConfig(**TINY))
    params = convert_torch_model(tmodel)
    jmodel = RenderFormer(RenderFormerConfig(**TINY))

    tri = rng.normal(size=(b, n, 9)).astype(np.float32) * 0.3
    tex = rng.uniform(0, 1, (b, n, 13, 32, 32)).astype(np.float32)
    mask = np.ones((b, n), bool)
    vns = rng.normal(size=(b, n, 9)).astype(np.float32)
    rays_o = rng.normal(size=(b, v, 3)).astype(np.float32)
    rays_d = rng.normal(size=(b, v, res, res, 3)).astype(np.float32)
    tri_view = rng.normal(size=(b, v, n, 9)).astype(np.float32) * 0.3

    # ---- torch side ----
    t_tex = torch.from_numpy(tex).requires_grad_(True)
    out = tmodel(torch.from_numpy(tri), t_tex, torch.from_numpy(mask),
                 torch.from_numpy(vns), torch.from_numpy(rays_o),
                 torch.from_numpy(rays_d), torch.from_numpy(tri_view))
    loss_t = (out ** 2).mean()
    loss_t.backward()
    want_dtex = t_tex.grad.numpy()
    want_dw = tmodel.texture_encoder.weight.grad.numpy()  # [out, in]

    # ---- jax side ----
    def loss_fn(tex_in, params):
        out = jmodel(params, jnp.asarray(tri), tex_in, jnp.asarray(mask),
                     jnp.asarray(vns), jnp.asarray(rays_o),
                     jnp.asarray(rays_d), jnp.asarray(tri_view),
                     dtype=jnp.float32, view_dtype=jnp.float32)
        return jnp.mean(jnp.square(out))

    (dtex, dparams) = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(tex), params)

    got_dtex = np.asarray(dtex)
    got_dw = np.asarray(dparams['texture_encoder']['kernel']).T  # -> [out, in]

    scale = max(np.abs(want_dtex).max(), 1e-12)
    np.testing.assert_allclose(got_dtex / scale, want_dtex / scale,
                               atol=2e-4)
    wscale = max(np.abs(want_dw).max(), 1e-12)
    np.testing.assert_allclose(got_dw / wscale, want_dw / wscale, atol=2e-4)

    # register-token gradients too (flow through RoPE + attention only)
    want_reg = tmodel.reg_tokens.grad.numpy()
    got_reg = np.asarray(dparams['reg_tokens'])
    rscale = max(np.abs(want_reg).max(), 1e-12)
    np.testing.assert_allclose(got_reg / rscale, want_reg / rscale, atol=2e-4)
