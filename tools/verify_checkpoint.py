"""One-command verification of a converted (or to-be-converted) RenderFormer
checkpoint — ready for the real `microsoft/renderformer-v1-base` /
`v1.1-swin-large` weights the moment a networked machine downloads them.

Usage:
    # HF-format dir (config.json + model.safetensors, as downloaded):
    python tools/verify_checkpoint.py --checkpoint /path/to/ckpt \
        [--h5_file scene.h5] [--resolution 256] [--torch_compare] \
        [--golden_exr ref.exr] [--save_exr out.exr]

Checks, in order:
  1. load path: safetensors -> converted pytree (or jax_format dir),
     config parse, parameter count vs the declared architecture;
  2. a finite-render smoke on random geometry (or --h5_file);
  3. optional numeric parity vs the in-tree torch reference running the
     same weights on CPU (--torch_compare; reports max|err| and PSNR);
  4. optional PSNR vs a golden EXR rendered by the reference GPU stack
     (--golden_exr), the check to run against real released weights.

Reference contract: /root/reference/renderformer/pipelines/
rendering_pipeline.py:14-18 (from_pretrained).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    peak = float(max(b.max() - b.min(), 1e-9))
    return 10 * np.log10(peak ** 2 / max(mse, 1e-20))


def load_scene(h5_file):
    import h5py
    with h5py.File(h5_file, 'r') as f:
        return dict(
            triangles=f['triangles'][:][None],
            texture=f['texture'][:].astype(np.float32)[None],
            mask=np.ones((1, f['triangles'].shape[0]), bool),
            vn=f['vn'][:][None],
            c2w=f['c2w'][:][None],
            fov=f['fov'][:][None, :, None],
        )


def random_scene(n=256, v=1, seed=0):
    rng = np.random.default_rng(seed)
    c2w = np.tile(np.eye(4, dtype=np.float32), (1, v, 1, 1))
    c2w[..., 2, 3] = 2.0
    return dict(
        triangles=rng.normal(size=(1, n, 3, 3)).astype(np.float32) * 0.3,
        texture=rng.uniform(0, 1, (1, n, 13, 32, 32)).astype(np.float32),
        mask=np.ones((1, n), bool),
        vn=rng.normal(size=(1, n, 3, 3)).astype(np.float32),
        c2w=c2w,
        fov=np.full((1, v, 1), 40.0, np.float32),
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--checkpoint', required=True,
                    help='HF-format dir (config.json + model.safetensors) '
                         'or a dir written by export_params')
    ap.add_argument('--h5_file', default=None)
    ap.add_argument('--resolution', type=int, default=256)
    ap.add_argument('--precision', default='fp32',
                    choices=['fp32', 'bf16', 'fp16'])
    ap.add_argument('--torch_compare', action='store_true',
                    help='also run the torch reference model with the same '
                         'weights on CPU and compare (needs /root/reference)')
    ap.add_argument('--golden_exr', default=None,
                    help='reference EXR to PSNR against')
    ap.add_argument('--save_exr', default=None)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from renderformer_tpu.nn.core import param_count
    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline

    # 1. load path ------------------------------------------------------
    pipe = RenderingPipeline.from_pretrained(args.checkpoint)
    cfg = pipe.config
    n_params = param_count(pipe.params)
    print(f'[1/4] loaded {args.checkpoint}')
    print(f'      latent_dim={cfg.latent_dim} layers={cfg.num_layers}'
          f'/{cfg.view_transformer_n_layers}'
          f' swin={cfg.view_transformer_use_swin_attn}')
    print(f'      params: {n_params / 1e6:.1f}M (incl. rope buffers)')

    # 2. render smoke ---------------------------------------------------
    scene = load_scene(args.h5_file) if args.h5_file else random_scene()
    img = np.asarray(pipe.render(
        scene['triangles'], scene['texture'], scene['mask'], scene['vn'],
        scene['c2w'], scene['fov'], resolution=args.resolution,
        precision=args.precision))
    finite = np.isfinite(img).all()
    print(f'[2/4] render {img.shape} {args.precision}: '
          f'finite={finite} range=[{img.min():.4f}, {img.max():.4f}]')
    if not finite:
        print('FAIL: non-finite pixels')
        return 1
    if args.save_exr:
        from renderformer_tpu.io.image import write_exr
        write_exr(args.save_exr, img[0, 0])
        print(f'      wrote {args.save_exr}')

    # 3. torch parity ---------------------------------------------------
    if args.torch_compare:
        sys.path.insert(0, os.path.join(REPO, 'tests'))
        from conftest import import_reference
        import_reference()
        import torch
        from renderformer.models.config import RenderFormerConfig as TC
        from renderformer.models.renderformer import RenderFormer as TRF
        from safetensors.torch import load_file
        tmodel = TRF(TC(**cfg.to_dict())).eval()
        sd = load_file(os.path.join(args.checkpoint, 'model.safetensors'))
        tmodel.load_state_dict(sd, strict=True)

        # run both raw models on identical pre-transformed inputs, fp32
        import jax.numpy as jnp
        r = random_scene(n=64, seed=1)
        b, n = 1, 64
        rng = np.random.default_rng(1)
        rays_o = rng.normal(size=(b, 1, 3)).astype(np.float32)
        rays_d = rng.normal(
            size=(b, 1, args.resolution, args.resolution, 3)).astype(np.float32)
        tri_view = rng.normal(size=(b, 1, n, 9)).astype(np.float32) * 0.3
        tri = r['triangles'].reshape(b, n, 9)
        vns = r['vn'].reshape(b, n, 9)
        with torch.no_grad():
            want = tmodel(
                torch.from_numpy(tri), torch.from_numpy(r['texture']),
                torch.from_numpy(r['mask']), torch.from_numpy(vns),
                torch.from_numpy(rays_o), torch.from_numpy(rays_d),
                torch.from_numpy(tri_view)).numpy()
        got = np.asarray(pipe.model(
            pipe.params, tri, r['texture'], r['mask'], vns,
            rays_o, rays_d, tri_view,
            dtype=jnp.float32, view_dtype=jnp.float32))
        got = np.transpose(got, (0, 1, 4, 2, 3))
        p = psnr(got, want)
        print(f'[3/4] torch parity: max|err|={np.abs(got - want).max():.3e} '
              f'PSNR={p:.1f} dB')
        if p < 60:
            print('FAIL: parity below 60 dB')
            return 1
    else:
        print('[3/4] torch parity: skipped (--torch_compare not set)')

    # 4. golden image ---------------------------------------------------
    if args.golden_exr:
        from renderformer_tpu.io.image import read_exr
        ref = read_exr(args.golden_exr)
        p = psnr(img[0, 0], ref)
        print(f'[4/4] golden EXR PSNR: {p:.2f} dB '
              f'({"OK" if p > 30 else "FAIL"} at the >30dB bf16 gate)')
        if p <= 30:
            return 1
    else:
        print('[4/4] golden EXR: skipped (--golden_exr not set)')

    print('checkpoint verified OK')
    return 0


if __name__ == '__main__':
    sys.exit(main())
