"""Microbench the pair-window swin kernel vs the XLA windowed-SDPA path
at 483M swin-large dims (512^2 -> 64x64 patches, 64 windows of 64 tokens,
8 heads x 128).  Chains REPS dependent calls inside one jit so the
axon-tunnel dispatch overhead amortizes (same recipe as attn_micro.py).

Usage: python tools/swin_micro.py [kernel|xla] [shift|noshift]
(one variant per process — remote compiles are minutes each; the
persistent cache makes reruns cheap)
"""
import sys
sys.path.insert(0, '/root/repo')

import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

from renderformer_tpu.ops.swin_attention import swin_window_attention
from renderformer_tpu.nn.attention import sdpa_xla, swin_attn_mask

B, nW, S, H, D = 8, 64, 64, 8, 128
C = H * D
REPS = 10

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B * nW, S, C)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B * nW, S, C)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B * nW, S, C)), jnp.bfloat16)

mask4 = jnp.tile(jnp.asarray(swin_attn_mask(64, 64, 8, 4)), (B, 1, 1))[:, None]


def xla_ref(x, k, v, m):
    qh = x.reshape(-1, S, H, D)
    kh = k.reshape(-1, S, H, D)
    vh = v.reshape(-1, S, H, D)
    return sdpa_xla(qh, kh, vh, m).reshape(-1, S, C)


def bench(op, iters=5):
    def chained(x, k, v):
        def body(x, _):
            return op(x, k, v).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(chained)
    t0 = time.perf_counter()
    c = float(f(q, k, v))
    print(f'  compiled+first run {time.perf_counter() - t0:.0f}s '
          f'checksum={c:.1f}', flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = float(f(q, k, v))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(c), c
    return (dt - 0.035) / REPS


which = sys.argv[1] if len(sys.argv) > 1 else 'kernel'
shift = (sys.argv[2] if len(sys.argv) > 2 else 'shift') == 'shift'

if which == 'kernel':
    if shift:
        op = lambda x, k, v: swin_window_attention(
            x, k, v, n_windows=nW, grid_hw=(64, 64), shift_size=4)
    else:
        op = lambda x, k, v: swin_window_attention(x, k, v, n_windows=nW)
else:
    m = mask4 if shift else None
    op = lambda x, k, v: xla_ref(x, k, v, m)

ms = bench(op) * 1e3
print(f'{which} shift={shift}: {ms:.3f} ms/op', flush=True)
