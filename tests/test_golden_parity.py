"""Golden parity: full-model forward vs the PyTorch reference on CPU,
fp32 vs fp32, with weights converted from the torch state_dict.

This is the strongest correctness gate in the suite — it exercises token
construction, RoPE, qk-norm, attention, Swin windows, FFNs, decoder taps
and the DPT head end to end (SURVEY.md §4 item 3)."""

import numpy as np
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


def _make_inputs(seed=0, b=1, n=8, v=2, res=64):
    rng = np.random.default_rng(seed)
    return dict(
        tri=rng.normal(size=(b, n, 9)).astype(np.float32) * 0.3,
        tex=rng.uniform(0, 1, size=(b, n, 13, 32, 32)).astype(np.float32),
        mask=np.concatenate(
            [np.ones((b, n - 2), bool), np.zeros((b, 2), bool)], axis=1),
        vns=rng.normal(size=(b, n, 9)).astype(np.float32),
        rays_o=rng.normal(size=(b, v, 3)).astype(np.float32),
        rays_d=rng.normal(size=(b, v, res, res, 3)).astype(np.float32),
        tri_view=rng.normal(size=(b, v, n, 9)).astype(np.float32) * 0.3,
    )


def _run_parity(overrides, seed=0, atol=2e-4, res=64):
    torch.manual_seed(seed)
    cfg_kw = dict(TINY, **overrides)
    tmodel = TorchRenderFormer(TorchConfig(**cfg_kw)).eval()
    params = convert_torch_model(tmodel)
    jmodel = RenderFormer(RenderFormerConfig(**cfg_kw))

    inp = _make_inputs(seed=seed, res=res)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(inp['tri']), torch.from_numpy(inp['tex']),
            torch.from_numpy(inp['mask']), torch.from_numpy(inp['vns']),
            torch.from_numpy(inp['rays_o']), torch.from_numpy(inp['rays_d']),
            torch.from_numpy(inp['tri_view']),
        ).numpy()  # [B, V, 3, H, W] (or [B, V, H, W, 3] for linear head? no: NCHW)

    got = np.asarray(jmodel(
        params,
        jnp.asarray(inp['tri']), jnp.asarray(inp['tex']),
        jnp.asarray(inp['mask']), jnp.asarray(inp['vns']),
        jnp.asarray(inp['rays_o']), jnp.asarray(inp['rays_d']),
        jnp.asarray(inp['tri_view']),
        dtype=jnp.float32, view_dtype=jnp.float32,
    ))  # [B, V, H, W, C] NHWC

    got_nchw = np.transpose(got, (0, 1, 4, 2, 3))
    np.testing.assert_allclose(got_nchw, want, atol=atol, rtol=1e-3)


def test_parity_default_dpt():
    _run_parity({})


def test_parity_swin():
    _run_parity({'view_transformer_use_swin_attn': True})


def test_parity_linear_head():
    _run_parity({'use_dpt_decoder': False})


def test_parity_nerf_pe():
    _run_parity({'pe_type': 'nerf'})


def test_parity_gelu_layernorm():
    _run_parity({'activation': 'gelu', 'norm_type': 'layer_norm',
                 'vn_encoder_norm_type': 'layer_norm',
                 'texture_encoder_norm_type': 'layer_norm'})


def test_parity_no_qk_norm_bias():
    _run_parity({'qk_norm': False, 'view_indep_qk_norm': False, 'bias': True})


def test_parity_stage1_tokens():
    """Intermediate parity: stage-1 encoder output tokens."""
    torch.manual_seed(1)
    tmodel = TorchRenderFormer(TorchConfig(**TINY)).eval()
    params = convert_torch_model(tmodel)
    jmodel = RenderFormer(RenderFormerConfig(**TINY))
    inp = _make_inputs(seed=1)

    with torch.no_grad():
        seq_t, mask_t, pos_t = tmodel.construct_seq(
            torch.from_numpy(inp['tri']), torch.from_numpy(inp['tex']),
            torch.from_numpy(inp['mask']), torch.from_numpy(inp['vns']))
        enc_t = tmodel.transformer(
            seq_t, src_key_padding_mask=mask_t, triangle_pos=pos_t).numpy()

    seq_j, mask_j, pos_j = jmodel.construct_seq(
        params, jnp.asarray(inp['tri']), jnp.asarray(inp['tex']),
        jnp.asarray(inp['mask']), jnp.asarray(inp['vns']))
    np.testing.assert_allclose(np.asarray(seq_j), seq_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos_j), pos_t.numpy(), atol=1e-6)
    enc_j = np.asarray(jmodel.encoder(
        params['transformer'], seq_j, mask=mask_j, triangle_pos=pos_j))
    np.testing.assert_allclose(enc_j, enc_t, atol=5e-5, rtol=1e-4)


def test_parity_include_alpha():
    _run_parity({'include_alpha': True})


def test_parity_rope_double_max_freq():
    _run_parity({'rope_double_max_freq': True})


def test_parity_triangle_learned():
    """rope_type='triangle_learned': the reference stores freqs as an
    nn.Parameter either way (rope.py:176 — requires_grad=False even when
    'learned'), so forward parity must hold with the converted freq
    values feeding params['rope_freqs']."""
    _run_parity({'rope_type': 'triangle_learned'})


def test_parity_vdir_freqs():
    """vdir_num_freqs>0: the ray map is NeRF-encoded before patchify
    (view_transformer.py:38-45) — exercises the non-identity vdir path
    and the widened patch projection."""
    _run_parity({'vdir_num_freqs': 2})


def test_parity_triangle_mixed_rejected_like_reference():
    """rope_type=triangle_mixed overrides rope_dim with head_dim
    (attention.py:569-573), which makes 9*head_dim/2 angles overflow
    head_dim/2 slots — the reference crashes on this path for every
    config (rope.py:96 'Dimension size must be non-negative'); we raise
    a clear error at the same point."""
    with pytest.raises(RuntimeError):
        torch.manual_seed(0)
        cfg_kw = dict(TINY, rope_type='triangle_mixed')
        tmodel = TorchRenderFormer(TorchConfig(**cfg_kw)).eval()
        inp = _make_inputs()
        with torch.no_grad():
            tmodel(torch.from_numpy(inp['tri']), torch.from_numpy(inp['tex']),
                   torch.from_numpy(inp['mask']), torch.from_numpy(inp['vns']),
                   torch.from_numpy(inp['rays_o']),
                   torch.from_numpy(inp['rays_d']),
                   torch.from_numpy(inp['tri_view']))

    with pytest.raises(ValueError):
        jmodel = RenderFormer(RenderFormerConfig(
            **dict(TINY, rope_type='triangle_mixed')))
        inp = _make_inputs()
        jmodel(jmodel.init(__import__('jax').random.key(0)),
               jnp.asarray(inp['tri']), jnp.asarray(inp['tex']),
               jnp.asarray(inp['mask']), jnp.asarray(inp['vns']),
               jnp.asarray(inp['rays_o']), jnp.asarray(inp['rays_d']),
               jnp.asarray(inp['tri_view']))


def test_parity_no_self_attn():
    _run_parity({'view_transformer_include_self_attn': False})


def test_padding_invariance():
    """Rendering a scene padded with masked-out triangles must produce
    the same image as the unpadded scene — the static-shape masking
    design must be airtight end to end."""
    import jax
    model = RenderFormer(RenderFormerConfig(**TINY))
    params = model.init(jax.random.key(5))
    rng = np.random.default_rng(5)
    b, n, v, res = 1, 6, 1, 32
    inp = dict(
        tri=rng.normal(size=(b, n, 9)).astype(np.float32) * 0.3,
        tex=rng.uniform(0, 1, (b, n, 13, 32, 32)).astype(np.float32),
        vns=rng.normal(size=(b, n, 9)).astype(np.float32),
        rays_o=rng.normal(size=(b, v, 3)).astype(np.float32),
        rays_d=rng.normal(size=(b, v, res, res, 3)).astype(np.float32),
        tri_view=rng.normal(size=(b, v, n, 9)).astype(np.float32) * 0.3,
    )

    out_exact = np.asarray(model(
        params, jnp.asarray(inp['tri']), jnp.asarray(inp['tex']),
        jnp.ones((b, n), bool), jnp.asarray(inp['vns']),
        jnp.asarray(inp['rays_o']), jnp.asarray(inp['rays_d']),
        jnp.asarray(inp['tri_view'])))

    pad = 10
    def padded(x, fill=0.0):
        shape = list(x.shape)
        shape[1] = pad
        return np.concatenate(
            [x, np.full(shape, fill, x.dtype)], axis=1)

    tri_p = padded(inp['tri'])
    tex_p = padded(inp['tex'])
    vns_p = padded(inp['vns'])
    tv_p = np.concatenate(
        [inp['tri_view'],
         np.zeros((b, v, pad, 9), np.float32)], axis=2)
    mask_p = np.concatenate(
        [np.ones((b, n), bool), np.zeros((b, pad), bool)], axis=1)

    out_padded = np.asarray(model(
        params, jnp.asarray(tri_p), jnp.asarray(tex_p),
        jnp.asarray(mask_p), jnp.asarray(vns_p),
        jnp.asarray(inp['rays_o']), jnp.asarray(inp['rays_d']),
        jnp.asarray(tv_p)))

    np.testing.assert_allclose(out_padded, out_exact, atol=2e-5, rtol=1e-4)
