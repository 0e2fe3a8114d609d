"""Micro-benchmark: Pallas fused bilinear resize vs the XLA gather path.

Shapes mirror the DPT refinenet chain of the v1-base 512² render
(B = views = 8, C = 128 features, bf16).

Usage: python tools/resize_micro.py [--iters 50] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time


def timeit(fn, *args, iters=50):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from renderformer_tpu.nn.conv import resize_bilinear_align_corners
    from renderformer_tpu.ops.fused_resize import (
        fused_resize, fused_resize_supported)

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    cases = [(32, 64, 128), (64, 128, 128), (128, 256, 128), (256, 512, 128)]
    for ih, oh, c in cases:
        x = jnp.asarray(rng.normal(size=(args.batch, ih, ih, c)), dt)
        if not fused_resize_supported(x, (oh, oh)):
            print(f'{ih}->{oh} c={c}: UNSUPPORTED')
            continue
        f_ref = jax.jit(lambda z, s=(oh, oh): resize_bilinear_align_corners(z, s))
        f_new = jax.jit(lambda z, s=(oh, oh): fused_resize(z, s))
        err = float(jnp.max(jnp.abs(
            f_ref(x).astype(jnp.float32) - f_new(x).astype(jnp.float32))))
        t_ref = timeit(f_ref, x, iters=args.iters)
        t_new = timeit(f_new, x, iters=args.iters)
        gb = (x.nbytes + args.batch * oh * oh * c * dt.itemsize) / 1e9
        print(f'{ih}->{oh} c={c} B={args.batch}: xla {t_ref*1e6:7.1f} us '
              f'({gb/t_ref:6.1f} GB/s)  pallas {t_new*1e6:7.1f} us '
              f'({gb/t_new:6.1f} GB/s)  speedup {t_ref/t_new:4.2f}x  '
              f'maxerr {err:.2e}')


if __name__ == '__main__':
    main()
