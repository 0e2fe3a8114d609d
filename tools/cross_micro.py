"""Microbench the CROSS-attention flash shape (ray queries x triangle
keys) with bq / split sweeps.

The device profile puts cross-attention at 64% of its matmul ideal
(1.68 ms/layer vs 1.08) while ray self-attention runs at 77%. Per-step
arithmetic says the straight-line S -> softmax -> PV chain is ~fully
serialized at Sk~2k (MXU 1.4us + VPU ~1.7us + MXU 1.4us ~= the measured
4.4us/step); `split` creates independent q sub-chains so Mosaic can
overlap one chain's softmax (VPU) with another's matmuls (MXU).

NOTE: earlier in-process split sweeps were invalidated by the jit-cache
bug ADVICE round-2 #1 (env read at trace time, not in the cache key) —
this sweep passes split explicitly through the fixed static argument.
"""
import sys
sys.path.insert(0, '/root/repo')

import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

from renderformer_tpu.ops import flash_attention as fa

import os
B = int(os.environ.get('CM_B', '8'))
H = int(os.environ.get('CM_H', '6'))
D = 128
SQ = int(os.environ.get('CM_SQ', '4096'))
SK = int(os.environ.get('CM_SK', '2064'))
REPS = 16
rng = np.random.default_rng(0)


def bench(kernel_fn, q, *rest, iters=5):
    def chained(q, *rest):
        def body(x, _):
            out = kernel_fn(x, *rest)
            return out.astype(x.dtype), ()
        x, _ = jax.lax.scan(body, q, None, length=REPS)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(chained)
    float(f(q, *rest))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = float(f(q, *rest))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(c), c
    return (dt - 0.035) / REPS  # subtract tunnel dispatch


q = jnp.asarray(rng.normal(size=(B, SQ, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, SK, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, SK, H, D)), jnp.bfloat16)
cq = jnp.asarray(rng.uniform(0.5, 1, (B, SQ, D)), jnp.float32)
sq_ = jnp.asarray(rng.uniform(-.5, .5, (B, SQ, D)), jnp.float32)
ck = jnp.asarray(rng.uniform(0.5, 1, (B, SK, D)), jnp.float32)
sk_ = jnp.asarray(rng.uniform(-.5, .5, (B, SK, D)), jnp.float32)
mask = jnp.asarray(rng.uniform(size=(B, SK)) < 0.99)

ideal = 2 * 2 * SQ * SK * D * B * H / 197e12
print(f'cross-attn {SQ}x{SK} B{B} H{H}: ideal {ideal*1e3:.2f} ms', flush=True)


def run(bq, split):
    def fn(x, k, v, m, a, b, c, d):
        return fa._flash_rope(x, k, v, m, a, b, c, d,
                              min(bq, SQ), fa._pick_bk(SK, None),
                              False, split)
    try:
        t = bench(fn, q, k, v, mask,
                  cq * 0.088, sq_ * 0.088, ck, sk_)
    except Exception as e:
        print(f'  bq={bq} split={split}: FAIL {type(e).__name__}: {e}')
        return
    print(f'  bq={bq:4d} split={split}: {t*1e3:6.3f} ms '
          f'({100*ideal/t:.0f}% of ideal)', flush=True)


splits = [int(x) for x in os.environ.get('CM_SPLITS', '1,2,4').split(',')]
bqs = [int(x) for x in os.environ.get('CM_BQS', '512,1024,2048').split(',')]
for bq in bqs:
    for split in splits:
        run(bq, split)

# the ray SELF-attention shape with the same sweep (77% at split=1):
SQ2 = 4096
ideal2 = 2 * 2 * SQ2 * SQ2 * D * B * H / 197e12
print(f'self-attn {SQ2}x{SQ2} B{B} H{H}: ideal {ideal2*1e3:.2f} ms',
      flush=True)
k2 = jnp.asarray(rng.normal(size=(B, SQ2, H, D)), jnp.bfloat16)
v2 = jnp.asarray(rng.normal(size=(B, SQ2, H, D)), jnp.bfloat16)


def run_self(bq, split):
    def fn(x, k, v):
        return fa._flash_nomask(x, k, v, min(bq, SQ2),
                                fa._pick_bk(SQ2, None), False, split)
    try:
        t = bench(fn, q, k2, v2)
    except Exception as e:
        print(f'  bq={bq} split={split}: FAIL {type(e).__name__}: {e}')
        return
    print(f'  bq={bq:4d} split={split}: {t*1e3:6.3f} ms '
          f'({100*ideal2/t:.0f}% of ideal)', flush=True)


for bq in (512, 1024):
    for split in (1, 2, 4):
        run_self(bq, split)
