"""Capture a TPU device trace of the headline render workload (the
bench.py configuration) and print the per-op-group summary.

Usage:
    python tools/trace_render.py [--views 8] [--tris 2048] [--res 512]
        [--iters 3] [--trace-dir /tmp/rf_trace] [--train]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--views', type=int, default=8)
    ap.add_argument('--tris', type=int, default=2048)
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--trace-dir', default='/tmp/rf_trace')
    ap.add_argument('--train', action='store_true',
                    help='trace a train step instead of inference')
    ap.add_argument('--preset', default='v1-base',
                    help="model preset ('v1-base' | 'v1.1-swin-large')")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass

    from renderformer_tpu.config import PRESETS
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.utils.profiling import trace

    model = RenderFormer(PRESETS[args.preset])
    params = model.init(jax.random.key(0))
    params = jax.device_put(params)
    if not args.train:
        # pre-cast weights like the product path (see bench.py): fp32
        # masters fed into the jit leave f32 weights streaming into the
        # down-proj fusions (47% MXU vs 95% pre-cast)
        from renderformer_tpu.nn.core import cast_params
        params = {
            **cast_params({k: v for k, v in params.items()
                           if k != 'view_transformer'}, jnp.bfloat16),
            'view_transformer': cast_params(params['view_transformer'],
                                            jnp.bfloat16),
        }

    rng = np.random.default_rng(0)
    bs, n_tris, n_views, res = 1, args.tris, args.views, args.res
    base_args = (
        jnp.asarray(rng.normal(size=(bs, n_tris, 3, 3)), jnp.float32) * 0.3,
        jnp.asarray(rng.uniform(0, 1, (bs, n_tris, 13, 32, 32)), jnp.float32),
        jnp.ones((bs, n_tris), bool),
        jnp.asarray(rng.normal(size=(bs, n_tris, 3, 3)), jnp.float32),
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (bs, n_views, 1, 1))),
        jnp.full((bs, n_views, 1), 40.0, jnp.float32),
    )

    impl = 'flash' if jax.devices()[0].platform == 'tpu' else 'xla'

    if args.train:
        from renderformer_tpu.training.state import (
            TrainConfig, TrainState, make_optimizer, make_train_step)
        tc = TrainConfig(resolution=min(args.res, 256), precision='bfloat16',
                         steps_per_epoch=4)
        tx = make_optimizer(tc)
        train_step, _ = make_train_step(model, tx, tc, impl=impl)
        state = jax.device_put(TrainState.create(params, tx))
        batch = {
            'triangles': base_args[0], 'texture': base_args[1],
            'mask': base_args[2], 'vn': base_args[3],
            'c2w': base_args[4][:, :1], 'fov': base_args[5][:, :1],
            'gt': jnp.asarray(
                rng.uniform(0, 1, (bs, 1, tc.resolution, tc.resolution, 3)),
                jnp.float32),
        }
        step = jax.jit(train_step, donate_argnums=(0,))

        state, m = step(state, batch)
        jax.block_until_ready(m)
        print('compiled; loss', float(m['loss']))
        with trace(args.trace_dir):
            for _ in range(args.iters):
                state, m = step(state, batch)
            jax.block_until_ready(m)
    else:
        from renderformer_tpu.pipelines.rendering_pipeline import render_fn
        base = partial(render_fn, model=model, resolution=res,
                       dtype=jnp.bfloat16, view_dtype=jnp.bfloat16, impl=impl)
        fn = jax.jit(lambda *a: jnp.sum(base(*a).astype(jnp.float32)))
        print('checksum', float(fn(params, *base_args)))
        with trace(args.trace_dir):
            t0 = time.perf_counter()
            acc = []
            for _ in range(args.iters):
                acc.append(fn(params, *base_args))
            jax.block_until_ready(acc)
            dt = (time.perf_counter() - t0) / args.iters
        print(f'{dt * 1e3:.1f} ms/iter wall '
              f'({bs * n_views * res * res / dt / 1e6:.1f} M rays/s)')

    from tools.profile_summary import main as summarize
    summarize([args.trace_dir, '--iters', str(args.iters), '--top', '30'])


if __name__ == '__main__':
    sys.exit(main())
