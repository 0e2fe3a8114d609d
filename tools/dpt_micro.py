"""Per-site microbenchmark of the hot DPT-head conv shapes on the TPU.

Measurement notes (the two traps this tool works around):
  * the axon tunnel costs ~25 ms per dispatch, so each program runs N
    instances and the timing loop keeps multiple programs in flight
    (wall == device time);
  * conv is LINEAR, so instances must be separated by a non-foldable
    nonlinearity — ``max(x, c_i)`` per instance — or XLA's algebraic
    simplifier collapses ``sum_i conv(x * c_i)`` into one conv.  A
    calibration program with the same max passes but no convs is timed
    and subtracted.

Usage:
    python tools/dpt_micro.py [--preset v1-base] [--n 8] [--s2d]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def site_list(preset: str):
    """(name, H, Cin, Cout, k, stride, pad, count_per_render)."""
    if preset == 'v1-base':
        oc = [96, 192, 384, 768]
        feat = 128
    else:
        oc = [128, 256, 512, 1024]
        feat = 128
    return [
        ('layer1_rn@256', 256, oc[0], feat, 3, 1, 1, 1),
        ('rcu@256', 256, feat, feat, 3, 1, 1, 4),
        ('fusion_out_1x1@512', 512, feat, feat, 1, 1, 0, 1),
        ('output_conv1@512', 512, feat, feat // 2, 3, 1, 1, 1),
        ('output_conv2a@512', 512, feat // 2, 32, 3, 1, 1, 1),
        ('output_conv2b_1x1@512', 512, 32, 3, 1, 1, 0, 1),
    ]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='v1-base')
    ap.add_argument('--n', type=int, default=8,
                    help='instances per jit program')
    ap.add_argument('--views', type=int, default=8)
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'fp32'])
    ap.add_argument('--s2d', action='store_true',
                    help='also time the space-to-depth variant of each '
                         '3x3 stride-1 site')
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from renderformer_tpu.nn.conv import conv2d

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass

    dt = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    B = args.views
    rng = np.random.default_rng(0)

    def time_fn(fn, *xs):
        f = jax.jit(fn)
        float(f(*xs))  # compile + warmup
        iters = 16
        futs = [f(*xs), f(*xs), f(*xs), f(*xs)]
        t0 = time.perf_counter()
        for _ in range(iters):
            futs.append(f(*xs))
            float(futs.pop(0))
        dtt = (time.perf_counter() - t0) / iters
        for fut in futs:
            float(fut)
        return dtt / args.n

    def guard(x, i):
        # non-foldable per-instance input: max(x, -1 - i) ~= x
        return jnp.maximum(x, jnp.asarray(-1.0 - i, x.dtype))

    total_ms = 0.0
    print(f'{"site":26s} {"ms/site":>9s} {"TF/s":>7s} {"ms/render":>10s}')
    for (name, h, cin, cout, k, stride, pad, cnt) in site_list(args.preset):
        x = jnp.asarray(rng.normal(size=(B, h, h, cin)), dt)
        kern = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, dt)

        def calib(x):
            acc = jnp.zeros((), jnp.float32)
            for i in range(args.n):
                acc = acc + jnp.sum(guard(x, i).astype(jnp.float32)[:, 0, 0])
            return acc

        def many(x, kern, _k=k, _s=stride, _p=pad):
            acc = jnp.zeros((), jnp.float32)
            for i in range(args.n):
                y = conv2d(guard(x, i), kern, stride=_s, padding=_p)
                acc = acc + jnp.sum(y.astype(jnp.float32))
            return acc

        base = time_fn(calib, x)
        dt_site = max(time_fn(many, x, kern) - base, 1e-9)
        ho = (h + 2 * pad - k) // stride + 1
        flops = 2 * B * ho * ho * k * k * cin * cout
        per_render = dt_site * cnt * 1e3
        total_ms += per_render
        print(f'{name:26s} {dt_site * 1e3:9.3f} {flops / dt_site / 1e12:7.1f} '
              f'{per_render:10.3f}', flush=True)

        if args.s2d and k == 3 and stride == 1:
            from renderformer_tpu.ops.s2d_conv import conv2d_s2d

            def many_s2d(x, kern):
                acc = jnp.zeros((), jnp.float32)
                for i in range(args.n):
                    y = conv2d_s2d(guard(x, i), kern, padding=1)
                    acc = acc + jnp.sum(y.astype(jnp.float32))
                return acc

            dt_s2d = max(time_fn(many_s2d, x, kern) - base, 1e-9)
            print(f'{"  s2d variant":26s} {dt_s2d * 1e3:9.3f} '
                  f'{flops / dt_s2d / 1e12:7.1f} '
                  f'{dt_s2d * cnt * 1e3:10.3f}', flush=True)

    print(f'{"TOTAL (per render)":26s} {"":9s} {"":7s} {total_ms:10.3f}')


if __name__ == '__main__':
    sys.exit(main())
