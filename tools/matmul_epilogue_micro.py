"""Microbench: FFN down-projection with the next RMSNorm's reduction
fused vs split.

The HEAD device profile (v1-base 512^2 x8) shows the six FFN
down-projections as `multiply_reduce_fusion` ops — XLA fuses the NEXT
norm's sum-of-squares reduction (and the residual add) into the matmul's
output fusion — running at 1.64 ms each, 94 TF/s, while the up-projection
of identical FLOPs runs at 0.81 ms (190 TF/s). Hypothesis: the fused
cross-lane reduction epilogue halves the Mosaic conv emitter's rate, and
re-reading the 50 MB activation for a standalone reduce (~0.07 ms at the
BW roof) is 10x cheaper than what the fusion costs the matmul.

Variants:
  fused  : ss computed directly on (x @ w + res) — what XLA does today
  barrier: optimization_barrier between the residual sum and the reduce,
           forcing the matmul fusion to close before the norm reduction
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

B, T, F, D = 8, 4096, 3072, 768
REPS = 30
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, F)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(F, D)) * 0.02, jnp.bfloat16)
res = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
scale = jnp.ones((D,), jnp.bfloat16)


def norm_tail(z, ss):
    var = ss[..., None] / z.shape[-1]
    inv = jax.lax.rsqrt(var + 1e-6).astype(z.dtype)
    return z * inv * scale


def fused(x, w, res):
    z = x @ w + res
    ss = jnp.einsum('...d,...d->...', z, z,
                    preferred_element_type=jnp.float32)
    return norm_tail(z, ss)


def barrier(x, w, res):
    z = x @ w + res
    zb = jax.lax.optimization_barrier(z)
    ss = jnp.einsum('...d,...d->...', zb, zb,
                    preferred_element_type=jnp.float32)
    return norm_tail(zb, ss)


def timeit(f):
    # On-device loop: the axon tunnel's ~25 ms round trip dwarfs sub-ms
    # ops, so time REPS dependent iterations inside ONE jit. The output
    # feeds back into the next iteration's residual to serialize them.
    def loop(x, w, res):
        def body(_, r):
            return f(x, w, r)
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, res)
                       .astype(jnp.float32))

    g = jax.jit(loop)
    float(g(x, w, res))  # compile
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        float(g(x, w, res))
    dt = (time.perf_counter() - t0) / (n * REPS)
    return dt * 1e3


if __name__ == '__main__':
    flops = 2 * B * T * F * D
    for name, f in (('fused', fused), ('barrier', barrier)):
        ms = timeit(f)
        print(f'{name:8s} {ms:6.3f} ms  {flops / ms / 1e9:6.1f} TF/s')
