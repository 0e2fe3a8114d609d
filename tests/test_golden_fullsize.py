"""FULL-SIZE golden parity: the real v1-base (205M) and v1.1-swin-large
(483M) architectures, fp32 CPU, vs the torch reference — through the
safetensors checkpoint-conversion path the real weights will use.

Round-1 gap (VERDICT.md missing #1): all golden tests ran 72-dim TINY
configs; bugs that only appear at full dims (rope_dim=12 against
head_dim=128, swin on 32x32 patch grids, 483M DPT channels) were
invisible.  These tests run the full architectures at 256^2 with random
reference weights and assert near-bitwise agreement, and prove the
HF-format load path end to end:
  torch state_dict -> model.safetensors + config.json ->
  RenderingPipeline.from_pretrained -> render.

Reference contract: /root/reference/renderformer/pipelines/
rendering_pipeline.py:14-18 (from_pretrained), README.md:94-97 (models).
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from conftest import import_reference  # noqa: E402

import_reference()

from renderformer.models.config import RenderFormerConfig as TorchConfig  # noqa: E402
from renderformer.models.renderformer import RenderFormer as TorchRenderFormer  # noqa: E402

from renderformer_tpu.config import PRESETS  # noqa: E402
from renderformer_tpu.models.renderformer import RenderFormer  # noqa: E402
from renderformer_tpu.nn.core import param_count  # noqa: E402
from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline  # noqa: E402


def _save_hf_checkpoint(tmodel, cfg, out_dir):
    """Write the torch model as an HF-format dir (config.json +
    model.safetensors), the shape of the real released checkpoints."""
    from safetensors.numpy import save_file
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'config.json'), 'w') as f:
        json.dump(cfg.to_dict(), f)
    sd = {k: v.detach().cpu().numpy()
          for k, v in tmodel.state_dict().items()}
    # contiguous copies: safetensors rejects non-contiguous arrays
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, os.path.join(out_dir, 'model.safetensors'))


def _inputs(seed, b=1, n=64, v=1, res=256):
    rng = np.random.default_rng(seed)
    return dict(
        tri=rng.normal(size=(b, n, 9)).astype(np.float32) * 0.3,
        tex=rng.uniform(0, 1, (b, n, 13, 32, 32)).astype(np.float32),
        mask=np.concatenate(
            [np.ones((b, n - 4), bool), np.zeros((b, 4), bool)], axis=1),
        vns=rng.normal(size=(b, n, 9)).astype(np.float32),
        rays_o=rng.normal(size=(b, v, 3)).astype(np.float32),
        rays_d=rng.normal(size=(b, v, res, res, 3)).astype(np.float32),
        tri_view=rng.normal(size=(b, v, n, 9)).astype(np.float32) * 0.3,
    )


def _run_fullsize(preset_name, expect_params_m, seed, atol):
    cfg = PRESETS[preset_name]
    torch.manual_seed(seed)
    tmodel = TorchRenderFormer(TorchConfig(**cfg.to_dict())).eval()

    n_torch = sum(p.numel() for p in tmodel.parameters())
    assert abs(n_torch / 1e6 - expect_params_m) < 1.0, n_torch

    # --- prove the real checkpoint load path (safetensors -> pipeline) ---
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        _save_hf_checkpoint(tmodel, cfg, d)
        pipe = RenderingPipeline.from_pretrained(d)
    assert pipe.config == cfg
    n_jax = param_count(pipe.params)
    # jax tree carries the non-learned rope_freqs buffers torch counts as
    # buffers, not parameters; compare against torch params + buffers
    n_torch_all = n_torch + sum(
        b.numel() for name, b in tmodel.named_buffers() if 'freqs' in name)
    assert n_jax == n_torch_all, (n_jax, n_torch_all)

    inp = _inputs(seed)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(inp['tri']), torch.from_numpy(inp['tex']),
            torch.from_numpy(inp['mask']), torch.from_numpy(inp['vns']),
            torch.from_numpy(inp['rays_o']), torch.from_numpy(inp['rays_d']),
            torch.from_numpy(inp['tri_view']),
        ).numpy()  # [B, V, 3, H, W]

    jmodel = RenderFormer(cfg)
    got = np.asarray(jmodel(
        pipe.params,
        jnp.asarray(inp['tri']), jnp.asarray(inp['tex']),
        jnp.asarray(inp['mask']), jnp.asarray(inp['vns']),
        jnp.asarray(inp['rays_o']), jnp.asarray(inp['rays_d']),
        jnp.asarray(inp['tri_view']),
        dtype=jnp.float32, view_dtype=jnp.float32,
    ))
    got_nchw = np.transpose(got, (0, 1, 4, 2, 3))

    err = np.abs(got_nchw - want)
    mse = float(np.mean((got_nchw - want) ** 2))
    peak = float(max(want.max() - want.min(), 1e-9))
    psnr = 10 * np.log10(peak ** 2 / max(mse, 1e-20))
    assert psnr > 80.0, (psnr, err.max())
    np.testing.assert_allclose(got_nchw, want, atol=atol, rtol=1e-3)


@pytest.mark.slow
def test_fullsize_v1_base_205m():
    _run_fullsize('v1-base', 205.2, seed=0, atol=5e-5)


@pytest.mark.slow
def test_fullsize_v1_1_swin_large_483m():
    _run_fullsize('v1.1-swin-large', 483.5, seed=1, atol=1e-4)
