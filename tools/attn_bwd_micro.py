"""Microbench the flash BACKWARD kernels (dQ + dKV) at the model's
attention shapes, sweeping the loop-block clamps (BWD_MAX_BQ/BWD_MAX_BK).

Chains REPS dependent grad calls inside one jit so the axon-tunnel
dispatch overhead (~35 ms/call) amortizes away.

Shapes benchmarked (v1-base at 512^2, 2048 triangles, 8 views):
  * ray self-attn    : Sq = Sk = 4096, B=8, unmasked
  * cross-attn       : Sq = 4096, Sk = 2064, B=8, masked
  * triangle self    : Sq = Sk = 2064, B=1, masked
"""
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


def bench_grad(sq, sk, b, masked, iters=4):
    q = jnp.asarray(rng.normal(size=(b, sq, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, sk, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, sk, H, D)), jnp.bfloat16)
    mask = jnp.ones((b, sk), bool) if masked else None

    def loss(q, k, v):
        out = fa.flash_attention(q, k, v, mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def chained(q, k, v):
        def body(carry, _):
            qq, kk, vv = carry
            dq, dk, dv = grad(qq, kk, vv)
            # feed grads back in so the scan iterations are dependent
            return ((qq + 1e-6 * dq.astype(qq.dtype)),
                    (kk + 1e-6 * dk.astype(kk.dtype)),
                    (vv + 1e-6 * dv.astype(vv.dtype))), ()
        (qq, kk, vv), _ = jax.lax.scan(body, (q, k, v), None, length=REPS)
        return jnp.sum(qq.astype(jnp.float32))

    f = jax.jit(chained)
    c = float(f(q, k, v))
    assert np.isfinite(c), c
    t0 = time.perf_counter()
    for _ in range(iters):
        c = float(f(q, k, v))
    dt = (time.perf_counter() - t0) / iters
    return (dt - 0.035) / REPS


SITES = [
    ('ray-self 4096x4096 B8', 4096, 4096, 8, False),
    ('cross 4096x2064 B8 mask', 4096, 2064, 8, True),
    ('tri-self 2064x2064 B1 mask', 2064, 2064, 1, True),
]

for name, sq, sk, b, masked in SITES:
    # fwd ~2 matmuls, bwd ~5 matmuls of the same shape
    ideal = 5 * 2 * sq * sk * D * b * H / 197e12
    print(f'=== {name}: bwd ideal {ideal*1e3:.2f} ms')
    for bq_max, bk_max in [(512, 512), (256, 512), (512, 256),
                           (1024, 512), (512, 1024), (1024, 1024),
                           (2048, 512), (512, 2048)]:
        fa.BWD_MAX_BQ, fa.BWD_MAX_BK = bq_max, bk_max
        try:
            t = bench_grad(sq, sk, b, masked)
            msg = f'{t*1e3:7.2f} ms  (bwd-kernel util ~{100*ideal/t:.0f}%)'
        except Exception as e:
            msg = f'FAIL {type(e).__name__}: {str(e)[:80]}'
        print(f'  bwd bq<={bq_max:4d} bk<={bk_max:4d}: {msg}', flush=True)
    fa.BWD_MAX_BQ = fa.BWD_MAX_BK = 512
