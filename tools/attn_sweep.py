"""Sweep flash-attention block sizes / q-splits at the two hot stage-2
sites (ray-self 4096x4096 rope-unmasked, cross 4096x2176 rope-masked).

Chains REPS dependent calls inside one jit so the axon-tunnel dispatch
(~35 ms) amortizes; reports per-call ms and % of the 2-matmul ideal.

Usage: python tools/attn_sweep.py [--site cross|self|both]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--site', default='both')
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--reps', type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

    from renderformer_tpu.ops.flash_attention import flash_attention_rope

    B, H, D = 8, 6, 128
    rng = np.random.default_rng(0)

    def bench(kernel_fn, q, *rest):
        def chained(q, *rest):
            def body(x, _):
                return kernel_fn(x, *rest).astype(x.dtype), ()
            x, _ = jax.lax.scan(body, q, None, length=args.reps)
            return jnp.sum(x.astype(jnp.float32))

        f = jax.jit(chained)
        float(f(q, *rest))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = float(f(q, *rest))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(c), c
        return (dt - 0.035) / args.reps

    def mk(s):
        return jnp.asarray(rng.normal(size=(B, s, H, D)), jnp.bfloat16)

    def mkcs(s):
        return (jnp.asarray(rng.uniform(0.5, 1, (B, s, D)), jnp.float32),
                jnp.asarray(rng.uniform(-0.5, 0.5, (B, s, D)), jnp.float32))

    sites = []
    if args.site in ('self', 'both'):
        sites.append(('ray-self', 4096, 4096, False))
    if args.site in ('cross', 'both'):
        sites.append(('cross', 4096, 2176, True))

    for name, SQ, SK, masked in sites:
        q, k, v = mk(SQ), mk(SK), mk(SK)
        cq, sq_ = mkcs(SQ)
        ck, sk_ = mkcs(SK)
        mask = jnp.ones((B, SK), bool) if masked else None
        ideal = 2 * 2 * SQ * SK * D * B * H / 197e12
        print(f'{name} {SQ}x{SK} B{B} H{H} masked={masked}: '
              f'ideal {ideal * 1e3:.2f} ms')
        for bq in (256, 512, 1024, 2048, 4096):
            for split in (1, 2, 4):
                os.environ['RFTPU_FWD_SPLIT'] = str(split)
                try:
                    t = bench(lambda x, kk, vv, a, b, c, d:
                              flash_attention_rope(x, kk, vv, mask,
                                                   a, b, c, d, bq=bq),
                              q, k, v, cq, sq_, ck, sk_)
                except Exception as e:
                    print(f'  bq={bq:4d} split={split}: FAIL '
                          f'{type(e).__name__}', flush=True)
                    continue
                print(f'  bq={bq:4d} split={split}: {t * 1e3:6.3f} ms '
                      f'({100 * ideal / t:5.1f}% of ideal)', flush=True)
    os.environ.pop('RFTPU_FWD_SPLIT', None)


if __name__ == '__main__':
    sys.exit(main())
