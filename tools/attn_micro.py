"""Microbench the flash kernels at the model's stage-2 shapes.

Chains REPS dependent kernel calls inside one jit so the axon-tunnel
dispatch overhead (~35 ms/call) amortizes away; reports per-call time.
"""
import sys
sys.path.insert(0, '/root/repo')

import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

from renderformer_tpu.ops.flash_attention import (
    flash_attention, flash_attention_rope)

B, H, D = 8, 6, 128
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


def mk(s):
    return jnp.asarray(rng.normal(size=(B, s, H, D)), jnp.bfloat16)


def mkcs(s):
    return (jnp.asarray(rng.uniform(0.5, 1, (B, s, D)), jnp.float32),
            jnp.asarray(rng.uniform(-0.5, 0.5, (B, s, D)), jnp.float32))


SQ = SK = 4096
q, k, v = mk(SQ), mk(SK), mk(SK)
cq, sq_ = mkcs(SQ)
ck, sk_ = mkcs(SK)
mask = jnp.ones((B, SK), bool)

ideal = 2 * 2 * SQ * SK * D * B * H / 197e12
print(f'self-attn {SQ}x{SK} B{B} H{H}: ideal {ideal*1e3:.2f} ms')

def safe(fn, *args):
    try:
        return bench(fn, *args)
    except Exception as e:
        return float('nan')


for bq, bk in [(512, None), (512, 2048), (512, 512)]:
    t1 = safe(lambda x, k, v: flash_attention(x, k, v, None, bq=bq, bk=bk),
              q, k, v)
    t2 = safe(lambda x, k, v, a, b, c, d:
              flash_attention_rope(x, k, v, None, a, b, c, d, bq=bq, bk=bk),
              q, k, v, cq, sq_, ck, sk_)
    t3 = safe(lambda x, k, v, m: flash_attention(x, k, v, m, bq=bq, bk=bk),
              q, k, v, mask)
    print(f'bq={bq:4d} bk={bk!s:>4}: plain {t1*1e3:6.2f}  rope {t2*1e3:6.2f}  '
          f'masked {t3*1e3:6.2f} ms  (util plain {100*ideal/t1:.0f}%)',
          flush=True)
