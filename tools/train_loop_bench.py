"""Sustained fine-tune s/step on the real dataset, per epoch — measures
the decoded-sample RAM cache + compact texture transport (VERDICT r4
next #4): epoch 0 pays the one-time gzip-9 H5 + GT decode; epoch >= 1
serves decoded tensors from memory and ships [N,13] textures.

Usage:
    python tools/train_loop_bench.py [--scenes 32] [--epochs 2]
        [--config configs/config_tpu_finetune.yml] [--no-cache]

Reports per-epoch sustained s/step (median over steps 3..N, skipping
compile/warmup) for direct comparison with BASELINE.md round 4
(1.05-1.11 s/step sustained, sync decode every epoch).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='configs/config_tpu_finetune.yml')
    ap.add_argument('--scenes', type=int, default=32)
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--no-cache', action='store_true')
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass

    from train import load_config
    from renderformer_tpu.pipelines.rendering_pipeline import (
        RenderingPipeline)
    from renderformer_tpu.training.dataset import RenderFormerDataset
    from renderformer_tpu.training.state import (
        TrainConfig, TrainState, make_optimizer, make_train_step)
    from renderformer_tpu.utils.prefetch import prefetch

    cfg = load_config(args.config)
    t, d, m = cfg.get('training', {}), cfg.get('data', {}), cfg.get('model', {})
    mem = cfg.get('memory', {})

    pipeline = RenderingPipeline.from_pretrained(m.get('model_id', 'v1-base'))
    model, params = pipeline.model, pipeline.params

    dataset = RenderFormerDataset(
        h5_dir=d['h5_dir'], gt_dir=d['gt_dir'],
        max_resolution=int(d.get('max_resolution', 256)),
        cache=not args.no_cache)
    tc = TrainConfig(
        learning_rate=float(t.get('learning_rate', 5e-6)),
        precision=mem.get('autocast_dtype', 'bfloat16'),
        resolution=int(d.get('max_resolution', 256)),
        remat=bool(mem.get('use_gradient_checkpointing', True)),
        bf16_shadow_params=bool(mem.get('bf16_shadow_params', False)),
    )
    tx = make_optimizer(tc)
    state = jax.device_put(TrainState.create(params, tx))
    train_step, _ = make_train_step(model, tx, tc, impl='flash')
    step = jax.jit(train_step, donate_argnums=(0,))

    indices = list(range(min(args.scenes, len(dataset))))
    bs = int(t.get('batch_size', 1))
    print(f'{len(indices)} scenes, cache={"off" if args.no_cache else "on"}, '
          f'bucket={dataset.padding_length}', flush=True)

    for epoch in range(args.epochs):
        times = []
        losses = []
        last = time.perf_counter()

        def loaded():
            for b in dataset.batches(indices, bs, shuffle=True,
                                     seed=42 + epoch):
                yield jax.device_put({k: np.asarray(v) for k, v in b.items()})

        for i, batch in enumerate(prefetch(loaded(), depth=2)):
            state, metrics = step(state, batch)
            losses.append(float(metrics['loss']))  # sync: true per-step
            now = time.perf_counter()
            times.append(now - last)
            last = now
        steady = sorted(times[2:])
        med = steady[len(steady) // 2]
        print(f'epoch {epoch}: {len(times)} steps, median '
              f'{med:.3f} s/step (first {times[0]:.2f}s incl. '
              f'{"compile+" if epoch == 0 else ""}decode), '
              f'mean loss {np.mean(losses):.5f}', flush=True)


if __name__ == '__main__':
    sys.exit(main())
