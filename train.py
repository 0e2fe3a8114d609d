"""Fine-tuning CLI (parity with /root/reference/train.py:705-801).

Usage:
    python train.py -c configs/config.yml [--resume checkpoints/best]

YAML schema matches the reference configs/config.yml; NCCL/DDP keys are
accepted and ignored (GSPMD over a TPU mesh replaces them).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_config(path: str) -> dict:
    import yaml
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return cfg or {}


def main():
    parser = argparse.ArgumentParser(description='Train RenderFormer (TPU)')
    parser.add_argument('-c', '--config', type=str,
                        default='configs/config.yml')
    parser.add_argument('--resume', type=str, default=None)
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import jax
    # multi-host init BEFORE any device use: TPU pod env or the reference's
    # MASTER_ADDR/RANK/WORLD_SIZE contract (train.py:26-63); single-process
    # runs fall through untouched
    from renderformer_tpu.parallel.distributed import (
        process_info, setup_distributed)
    distributed = setup_distributed()
    is_main = jax.process_index() == 0
    if distributed and is_main:
        print(f'distributed: {process_info()}')

    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline
    from renderformer_tpu.training.dataset import RenderFormerDataset
    from renderformer_tpu.training.state import TrainConfig
    from renderformer_tpu.training.trainer import (
        RenderFormerTrainer, TrainerConfig)

    cfg = load_config(args.config)
    t = cfg.get('training', {})
    d = cfg.get('data', {})
    m = cfg.get('model', {})
    o = cfg.get('output', {})
    mem = cfg.get('memory', {})

    pipeline = RenderingPipeline.from_pretrained(m.get('model_id', 'v1-base'))
    model, params = pipeline.model, pipeline.params

    dataset = RenderFormerDataset(
        h5_dir=d.get('h5_dir', 'datasets/h5'),
        gt_dir=d.get('gt_dir', 'datasets/gt'),
        max_resolution=int(d.get('max_resolution', 256)),
    )
    if len(dataset) == 0:
        print('no training scenes found; check data.h5_dir')
        return 1

    precision = mem.get('autocast_dtype', 'bfloat16')
    if precision == 'float16':
        precision = 'bfloat16'  # no fp16 on TPU

    train_cfg = TrainConfig(
        learning_rate=float(t.get('learning_rate', 5e-6)),
        weight_decay=float(t.get('weight_decay', 1e-4)),
        max_grad_norm=float(t.get('max_grad_norm', 1.0)),
        num_epochs=int(t.get('num_epochs', 3)),
        precision=precision,
        resolution=int(d.get('max_resolution', 256)),
        remat=bool(mem.get('use_gradient_checkpointing', False)),
        bf16_shadow_params=bool(mem.get('bf16_shadow_params', False)),
    )
    trainer_cfg = TrainerConfig(
        train=train_cfg,
        batch_size=int(t.get('batch_size', 1)),
        train_val_split=float(d.get('train_val_split', 0.8)),
        checkpoint_dir=o.get('checkpoint_dir', 'checkpoints'),
        log_dir=o.get('log_dir', 'runs/renderformer_tpu'),
        save_interval=int(o.get('save_interval', 5)),
        resume_from=args.resume,
    )

    if is_main:
        print(f'devices: {len(jax.devices())} '
              f'({len(jax.local_devices())} local)')
    trainer = RenderFormerTrainer(model, params, dataset, trainer_cfg)
    result = trainer.fit()
    if is_main:
        print('final train losses:',
              [round(x, 6) for x in result['train_losses']])
    from renderformer_tpu.parallel.distributed import teardown_distributed
    if distributed:
        teardown_distributed()
    return 0


if __name__ == '__main__':
    sys.exit(main())
