"""Compare the fused single-pass flash backward vs the two-kernel design
on the real TPU at the model's attention shapes."""
import os
import sys
sys.path.insert(0, '/root/repo')

import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

import renderformer_tpu.ops.flash_attention as fa

H, D = 6, 128
REPS = 8
rng = np.random.default_rng(0)


def bench_bwd(bwd_fn, sq, sk, b, masked, iters=4):
    q = jnp.asarray(rng.normal(size=(b, sq, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, sk, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, sk, H, D)), jnp.bfloat16)
    mask = jnp.ones((b, sk), bool) if masked else None
    do = jnp.asarray(rng.normal(size=(b, sq, H, D)), jnp.bfloat16)

    def chained(q, k, v, do):
        out, lse = fa._flash_fwd(q, k, v, mask, bq=512,
                                 bk=fa._pick_bk(sk, None),
                                 interpret=False, with_lse=True)

        def body(carry, _):
            qq, kk, vv = carry
            dq, dk, dv = bwd_fn(qq, kk, vv, mask, out, lse, do,
                                512, 512, False)
            return ((qq + 1e-6 * dq.astype(qq.dtype)),
                    (kk + 1e-6 * dk.astype(kk.dtype)),
                    (vv + 1e-6 * dv.astype(vv.dtype))), ()
        (qq, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=REPS)
        return jnp.sum(qq.astype(jnp.float32))

    f = jax.jit(chained)
    c = float(f(q, k, v, do))
    assert np.isfinite(c), c
    t0 = time.perf_counter()
    for _ in range(iters):
        c = float(f(q, k, v, do))
    dt = (time.perf_counter() - t0) / iters
    return (dt - 0.035) / REPS


SITES = [
    ('ray-self 4096x4096 B8', 4096, 4096, 8, False),
    ('cross 4096x2064 B8 mask', 4096, 2064, 8, True),
    ('tri-self 2064x2064 B8 mask', 2064, 2064, 8, True),
]

for name, sq, sk, b, masked in SITES:
    ideal5 = 5 * 2 * sq * sk * D * b * H / 197e12
    t_two = bench_bwd(fa._flash_bwd_twokernel, sq, sk, b, masked)
    t_fused = bench_bwd(fa._flash_bwd_fused, sq, sk, b, masked)
    print(f'{name}: two-kernel {t_two*1e3:6.2f} ms | fused '
          f'{t_fused*1e3:6.2f} ms ({t_two/t_fused:.2f}x, '
          f'fused util ~{100*ideal5/t_fused:.0f}% of 5-matmul ideal)',
          flush=True)
