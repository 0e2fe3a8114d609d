"""Microbench RMSNorm formulations at the stage-2 qk-norm shape."""
import sys
sys.path.insert(0, '/root/repo')

import time
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

B, S, D = 8, 4096, 768
REPS = 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
scale = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
EPS = 1e-6


_DISPATCH = None


def dispatch_overhead():
    global _DISPATCH
    if _DISPATCH is None:
        f = jax.jit(lambda v: jnp.sum(v))
        z = jnp.ones((8, 128), jnp.float32)
        float(f(z))
        t0 = time.perf_counter()
        for _ in range(10):
            float(f(z))
        _DISPATCH = (time.perf_counter() - t0) / 10
        print(f'dispatch overhead: {_DISPATCH*1e3:.1f} ms')
    return _DISPATCH


def bench(fn, *args, iters=5):
    def chained(x0, *rest):
        def body(c, _):
            return fn(c, *rest).astype(c.dtype), ()
        y, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(y.astype(jnp.float32))
    f = jax.jit(chained)
    base = dispatch_overhead()
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = float(f(*args))
    assert np.isfinite(c)
    return ((time.perf_counter() - t0) / iters - base) / REPS


def rms_current(x, scale):
    ss = jnp.einsum('...d,...d->...', x, x,
                    preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(ss[..., None] / x.shape[-1] + EPS)
    return x * inv.astype(x.dtype) * scale.astype(x.dtype)


def rms_fp32(x, scale):
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + EPS)
    return (x32 * inv * scale).astype(x.dtype)


def _rms_kernel(x_ref, s_ref, o_ref):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    ss = jnp.sum(xf * xf, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(ss / x.shape[-1] + EPS).astype(x.dtype)
    o_ref[:] = x * inv * s_ref[:].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=('rows',))
def rms_pallas(x, scale, rows=512):
    b, s, d = x.shape
    x2 = x.reshape(b * s, d)
    out = pl.pallas_call(
        _rms_kernel,
        grid=(b * s // rows,),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * s, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=jax.devices()[0].platform != 'tpu',
    )(x2, scale.reshape(1, d))
    return out.reshape(b, s, d)


bw_floor = (x.size * 2 * 2) / 819e9
print(f'[{B},{S},{D}] bf16: BW floor ~{bw_floor*1e3:.3f} ms')
for name, fn in [('einsum-current', rms_current),
                 ('fp32-mean', rms_fp32),
                 ('pallas-fused', rms_pallas)]:
    t = bench(fn, x, scale)
    print(f'{name:<16} {t*1e3:7.3f} ms', flush=True)

# the qk pattern: two norms over slices of one [B,S,2304] tensor
qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)), jnp.bfloat16)


def qk_current(qkv, scale):
    q, k, v = jnp.split(qkv, 3, -1)
    return rms_current(q, scale) + rms_current(k, scale) + v


def qk_pallas(qkv, scale):
    q, k, v = jnp.split(qkv, 3, -1)
    return rms_pallas(q, scale) + rms_pallas(k, scale) + v


for name, fn in [('qk einsum', qk_current), ('qk pallas', qk_pallas)]:
    def wrap(x0, qkv, scale, fn=fn):
        return x0 + fn(qkv, scale)[:, :, :D].astype(x0.dtype)
    t = bench(wrap, x, qkv, scale)
    print(f'{name:<16} {t*1e3:7.3f} ms', flush=True)
