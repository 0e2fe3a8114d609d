"""TPU-scale convergence run (VERDICT r2 missing #1, the hardware twin of
tests/test_convergence.py::test_overfit_recovers_perturbed_weights).

Protocol — self-generated GT, no Blender, no trained weights needed:
  1. generate N camera-orbit frames of an example scene
     (tools/make_video_frames.py — real geometry, inside the trained
     envelope, reference README.md:308-310);
  2. render GT for each frame with a TEACHER model at params W_t
     (fp32, impl='xla' — the numerical reference path);
  3. perturb W_t by relative noise (sigma=0.1, the measured sweep of
     tests/test_convergence.py) to get the student;
  4. fine-tune the student on the MSE objective with the reference's
     fine-tune schedule shape (bs=1, low LR; reference
     configs/config.yml:2-36) and assert the loss collapses.

Artifacts:
  * docs/training_losses_tpu.png — the loss curve (the reference ships
    training_losses.png in-repo; reference train.py:626-641);
  * tools/overfit_run_tpu.json — losses, recovery ratio, measured
    train-step wall time, config, hardware.

Usage (TPU, ~10 min):
    python tools/overfit_run.py --res 256 --scenes 8 --epochs 8
CPU smoke (~2 min):
    python tools/overfit_run.py --res 64 --scenes 2 --epochs 2 \
        --preset tiny --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tiny_config():
    from renderformer_tpu.config import RenderFormerConfig
    return RenderFormerConfig(
        latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
        num_register_tokens=4, vertex_pe_num_freqs=4,
        view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
        view_transformer_n_heads=2, view_transformer_n_layers=4,
        dpt_features=16, dpt_out_channels=[8, 16, 32, 64])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='v1-base',
                    help="'v1-base' | 'v1.1-swin-large' | 'tiny'")
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--scenes', type=int, default=8)
    ap.add_argument('--epochs', type=int, default=8)
    ap.add_argument('--lr', type=float, default=3e-5)
    ap.add_argument('--sigma', type=float, default=0.1)
    ap.add_argument('--workdir', default='/tmp/rf_overfit')
    ap.add_argument('--scene', default=os.path.join(REPO, 'examples/cbox.json'))
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--precision', default='bfloat16',
                    choices=['bfloat16', 'float32'])
    ap.add_argument('--artifacts', action='store_true',
                    help='write docs/training_losses_tpu.png + '
                         'tools/overfit_run_tpu.json into the repo')
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + ' --xla_force_host_platform_device_count=8')
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass
    import imageio
    import jax.numpy as jnp
    from renderformer_tpu.config import PRESETS
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.pipelines.rendering_pipeline import render_fn
    from renderformer_tpu.training.dataset import RenderFormerDataset
    from renderformer_tpu.training.state import TrainConfig
    from renderformer_tpu.training.trainer import (
        RenderFormerTrainer, TrainerConfig)
    from tools.make_video_frames import main as make_frames

    t_start = time.perf_counter()
    data_dir = os.path.join(args.workdir, 'data')
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    make_frames(['--scene', args.scene, '--out', data_dir,
                 '--frames', str(args.scenes), '--arc', '360'])

    cfg = _tiny_config() if args.preset == 'tiny' else PRESETS[args.preset]
    model = RenderFormer(cfg)
    w_teacher = model.init(jax.random.key(0))

    # --- teacher GT renders (fp32 XLA path = numerical reference) ------
    ds0 = RenderFormerDataset(h5_dir=data_dir, gt_dir=data_dir,
                              max_resolution=args.res)
    gt_fn = None
    from renderformer_tpu.training.dataset import expand_texture_flat
    for i in range(len(ds0)):
        item = ds0[i]
        if 'texture_flat' in item:  # compact per-face cache form
            item['texture'] = expand_texture_flat(item.pop('texture_flat'))
        if gt_fn is None:
            from functools import partial
            gt_fn = jax.jit(partial(
                render_fn, model=model, resolution=args.res,
                dtype=jnp.float32, view_dtype=jnp.float32, impl='xla'))
        img = np.asarray(gt_fn(
            w_teacher, jnp.asarray(item['triangles'])[None],
            jnp.asarray(item['texture'])[None],
            jnp.asarray(item['mask'])[None], jnp.asarray(item['vn'])[None],
            jnp.asarray(item['c2w'])[None], jnp.asarray(item['fov'])[None],
        ))[0, 0]
        base = os.path.splitext(os.path.basename(ds0.h5_files[i]))[0]
        imageio.v3.imwrite(
            os.path.join(data_dir, f'{base}.png'),
            (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f'teacher GT: {len(ds0)} frames at {args.res}^2', flush=True)

    # --- student = teacher + relative noise ----------------------------
    noise_rng = np.random.default_rng(7)

    def perturb(p):
        scale = args.sigma * float(np.std(np.asarray(p)) + 1e-3)
        return p + jnp.asarray(
            noise_rng.normal(size=p.shape) * scale, p.dtype)

    w_student = jax.tree.map(perturb, w_teacher)

    dataset = RenderFormerDataset(h5_dir=data_dir, gt_dir=data_dir,
                                  max_resolution=args.res)
    log_dir = os.path.join(args.workdir, 'tb')
    tcfg = TrainerConfig(
        train=TrainConfig(num_epochs=args.epochs, precision=args.precision,
                          resolution=args.res, learning_rate=args.lr,
                          warmup_steps=0),
        batch_size=2 if args.cpu else 1,  # reference fine-tune uses bs=1;
        # the CPU smoke shards bs=2 over the virtual (2,4) mesh instead
        train_val_split=1.0,
        checkpoint_dir=os.path.join(args.workdir, 'ckpt'),
        log_dir=log_dir,
        save_interval=10 ** 6,
        mesh_shape=(2, 4) if args.cpu else (1, 1),
        attn_impl='auto',
        log_every=1)
    trainer = RenderFormerTrainer(model, w_student, dataset, tcfg)

    t_fit = time.perf_counter()
    result = trainer.fit()
    fit_s = time.perf_counter() - t_fit

    losses = [float(x) for x in result['train_losses']]
    steps_total = args.epochs * (len(dataset) // tcfg.batch_size)
    # per-step time excluding the compile: epoch 1 absorbs compilation,
    # so use the last epochs' share of wall time
    recovery = losses[-1] / losses[0] if losses[0] else float('nan')
    platform = jax.devices()[0].platform
    out = {
        'preset': args.preset,
        'platform': platform,
        'resolution': args.res,
        'scenes': len(dataset),
        'padding_length': dataset.padding_length,
        'epochs': args.epochs,
        'batch_size': tcfg.batch_size,
        'precision': args.precision,
        'lr': args.lr,
        'sigma': args.sigma,
        'loss_first_epoch': losses[0],
        'loss_last_epoch': losses[-1],
        'recovery_ratio': recovery,
        'losses': losses,
        'fit_wall_s': round(fit_s, 2),
        'steps_total': steps_total,
        'wall_s_total': round(time.perf_counter() - t_start, 2),
    }
    print(json.dumps(out), flush=True)

    ok = (np.all(np.isfinite(losses))
          and losses[-1] < 0.5 * losses[0]
          and (len(losses) < 3 or max(losses[2:]) < losses[0]))
    if args.artifacts:
        src = os.path.join(log_dir, 'training_losses.png')
        if os.path.exists(src):
            shutil.copy(src, os.path.join(REPO, 'docs',
                                          'training_losses_tpu.png'))
        with open(os.path.join(REPO, 'tools', 'overfit_run_tpu.json'),
                  'w') as f:
            json.dump(out, f, indent=1)
    if not ok:
        print('CONVERGENCE CHECK FAILED', file=sys.stderr)
        return 1
    print(f'converged: loss {losses[0]:.5f} -> {losses[-1]:.5f} '
          f'({recovery:.3f}x) over {args.epochs} epochs x {len(dataset)} '
          f'steps on {platform}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
