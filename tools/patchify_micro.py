"""Microbench: ray-map patch embedding formulations.

The device profile shows the fused normalize+patchify reorg (fusion.18,
bf16[8,64,64,3,8,8] from f32[8,64,8,64,8,3]) at ~1.06 ms — 23x its HBM
bound — because the input view's minor dim is c=3: (8,128) tiling leaves
125/128 lanes dead on every read. Candidates:

  a) current: einsum 'bhpwqc,cpqd->bhwd' on the 6-D reshape view
  b) conv: lax.conv_general_dilated stride=kernel=8 (XLA picks its own
     internal space-to-depth layout)
  c) 2-step: matmul on [b,(h p),(w q),c] x [c,d'] first? (not tried —
     contraction c=3 starves the MXU)

Each includes the fp32 normalize (divide by per-ray norm) producer, as
in the model.
"""
import sys
sys.path.insert(0, '/root/repo')

import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

B, RES, P, C, D = 8, 512, 8, 3, 768
HP = RES // P
REPS = 8
rng = np.random.default_rng(0)

raw = jnp.asarray(rng.normal(size=(B, RES, RES, C)), jnp.float32)
kern = jnp.asarray(rng.normal(size=(C * P * P, D)) * 0.02, jnp.bfloat16)


def normalize(r):
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)


def einsum_path(raw, kern):
    ray = normalize(raw)
    x = ray.reshape(B, HP, P, HP, P, C).astype(jnp.bfloat16)
    k6 = kern.reshape(C, P, P, D)
    enc = jnp.einsum('bhpwqc,cpqd->bhwd', x, k6)
    return enc.reshape(B, HP * HP, D)


def conv_path(raw, kern):
    ray = normalize(raw).astype(jnp.bfloat16)
    # kernel rows are (c, p1, p2)-ordered; conv HWIO wants [p1, p2, c, d]
    k = kern.reshape(C, P, P, D).transpose(1, 2, 0, 3)
    enc = lax.conv_general_dilated(
        ray, k, window_strides=(P, P), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return enc.reshape(B, HP * HP, D)


def bench(fn, iters=5):
    def chained(raw, kern):
        def body(carry, _):
            out = fn(raw + carry, kern)
            return jnp.mean(out).astype(jnp.float32), ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    f = jax.jit(chained)
    float(f(raw, kern))
    t0 = time.perf_counter()
    for _ in range(iters):
        c = float(f(raw, kern))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(c)
    return (dt - 0.035) / REPS


# parity first
a = jax.jit(einsum_path)(raw, kern)
b = jax.jit(conv_path)(raw, kern)
err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
print(f'max |einsum - conv| = {err:.2e}')

ideal_matmul = B * HP * HP * C * P * P * D * 2 / 197e12
print(f'matmul ideal {ideal_matmul*1e3:.3f} ms')
for name, fn in [('einsum', einsum_path), ('conv', conv_path)]:
    t = bench(fn)
    print(f'  {name}: {t*1e3:.3f} ms', flush=True)
