"""End-to-end train-step benchmark on the real TPU.

Default: v1-base 205M, fwd+bwd+AdamW at 256^2, bs=1, 2048 triangles
(the reference fine-tune configuration, configs/config.yml).  Env
knobs: RFTPU_BENCH_PRESET (v1-base | v1.1-swin-large), RFTPU_BENCH_RES,
RFTPU_BENCH_TRIS, RFTPU_BENCH_REMAT=1, RFTPU_BENCH_VIEWS.  Compares the
fused single-pass flash backward (default) against the two-kernel
design (RFTPU_FUSED_BWD=0) when run twice with the env toggled.
"""
import os
import sys
sys.path.insert(0, '/root/repo')

import time
import jax, jax.numpy as jnp, numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

from renderformer_tpu.config import PRESETS
from renderformer_tpu.models.renderformer import RenderFormer
from renderformer_tpu.training.state import (
    TrainConfig, TrainState, make_optimizer, make_train_step)

res = int(os.environ.get('RFTPU_BENCH_RES', '256'))
n = int(os.environ.get('RFTPU_BENCH_TRIS', '2048'))
v = int(os.environ.get('RFTPU_BENCH_VIEWS', '1'))
bs = 1
preset = os.environ.get('RFTPU_BENCH_PRESET', 'v1-base')
remat = os.environ.get('RFTPU_BENCH_REMAT', '0') == '1'

model = RenderFormer(PRESETS[preset])
params = model.init(jax.random.key(0))
tc = TrainConfig(resolution=res, precision='bfloat16', steps_per_epoch=100,
                 remat=remat)
tx = make_optimizer(tc)
state = jax.device_put(TrainState.create(params, tx))

rng = np.random.default_rng(0)
batch = {
    'triangles': jnp.asarray(rng.normal(size=(bs, n, 3, 3)), jnp.float32) * 0.3,
    'texture': jnp.asarray(rng.uniform(0, 1, (bs, n, 13, 32, 32)), jnp.float32),
    'mask': jnp.ones((bs, n), bool),
    'vn': jnp.asarray(rng.normal(size=(bs, n, 3, 3)), jnp.float32),
    'c2w': jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (bs, v, 1, 1))),
    'fov': jnp.full((bs, v, 1), 40.0, jnp.float32),
    'gt': jnp.asarray(rng.uniform(0, 1, (bs, v, res, res, 3)), jnp.float32),
}

train_step, _ = make_train_step(model, tx, tc, impl='flash')
step = jax.jit(train_step, donate_argnums=(0,))

state, m = step(state, batch)   # compile + warmup
loss = float(m['loss'])
assert np.isfinite(loss), loss

iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, m = step(state, batch)
loss = float(m['loss'])  # forces completion of the chain
dt = (time.perf_counter() - t0) / iters
fused = os.environ.get('RFTPU_FUSED_BWD', '1') != '0'
print(f'train step {preset} {res}^2 bs{bs} v{v} {n}tris remat={remat} '
      f'fused_bwd={fused}: {dt*1e3:.1f} ms/step (loss {loss:.5f})')
