"""Headline benchmark: rays/s/chip at 512^2 for BOTH released model sizes
(v1-base 205M, v1.1-swin-large 483M) at BOTH precision policies.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline value stays the round-1 metric (v1-base, all-bf16, 512^2) for
cross-round comparability; "extra" carries the other three configs:
  * all-bf16 = both stages bf16 — the shipped default since round 3:
    bf16-view measures 59.6 dB HDR PSNR vs all-fp32 at full 483M size
    (tools/precision_study.py; the reference's fp32/TF32 view island
    guards CUDA-fp16 logit overflow, which bf16's fp32-range exponent
    does not have);
  * fp32view = bf16 stage 1 + fp32 stage 2 (the pre-round-3 default,
    mirroring the reference's fp16 + TF32-view split) — kept so both
    precision policies stay reported across rounds.

Workload matches the reference's canonical inference path
(/root/reference/infer.py: fp16 autocast stage 1 + TF32 stage 2 at 512^2):
2048 triangles, 8 views per batch (amortizes the axon-tunnel ~35 ms fixed
dispatch overhead; real deployments batch many views per program anyway).

vs_baseline scale: the reference publishes no throughput numbers
(BASELINE.md); we normalize against a 5.0e5 rays/s estimate for the torch
reference on a datacenter GPU (~2 512^2 views/s), so vs_baseline=2.0
corresponds to the BASELINE.json "2x torch-GPU" target.  A MEASURED
same-host torch-CPU anchor (tools/torch_cpu_anchor.py, committed as
tools/torch_cpu_anchor.json) is reported alongside in "extra" with its
provenance, so the only estimated quantity left is the CPU->GPU scale.
"""

import json
import os
import sys
import time

import numpy as np

TORCH_GPU_RAYS_PER_S_ESTIMATE = 5.0e5


def bench_config(preset_name, view_precision, res=512, n_tris=2048,
                 n_views=8, bs=1, iters=5, windows=1):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from renderformer_tpu.config import PRESETS
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.pipelines.rendering_pipeline import render_fn

    platform = jax.devices()[0].platform
    impl = 'flash' if platform == 'tpu' else 'xla'

    model = RenderFormer(PRESETS[preset_name])
    params = jax.device_put(model.init(jax.random.key(0)))
    # Pre-cast the weights to the compute dtypes ONCE, exactly like the
    # product path (RenderingPipeline.render's _cast_params cache).
    # Feeding fp32 masters into the jit left the down-projection weights
    # streaming as f32 with the convert fused into the consumer — those
    # matmul fusions measured 47% MXU vs 95% for pre-cast bf16 weights
    # (device profile, v5e): the harness was benching a path no user runs.
    from renderformer_tpu.nn.core import cast_params
    view_dtype = jnp.float32 if view_precision == 'fp32' else jnp.bfloat16
    params = {
        **cast_params({k: v for k, v in params.items()
                       if k != 'view_transformer'}, jnp.bfloat16),
        'view_transformer': cast_params(params['view_transformer'],
                                        view_dtype),
    }

    rng = np.random.default_rng(0)
    args = (
        params,
        jnp.asarray(rng.normal(size=(bs, n_tris, 3, 3)), jnp.float32) * 0.3,
        jnp.asarray(rng.uniform(0, 1, (bs, n_tris, 13, 32, 32)), jnp.float32),
        jnp.ones((bs, n_tris), bool),
        jnp.asarray(rng.normal(size=(bs, n_tris, 3, 3)), jnp.float32),
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (bs, n_views, 1, 1))),
        jnp.full((bs, n_views, 1), 40.0, jnp.float32),
    )

    base = partial(render_fn, model=model, resolution=res,
                   dtype=jnp.bfloat16, view_dtype=view_dtype, impl=impl)
    # Reduce the image to a scalar on-device: through the axon tunnel,
    # block_until_ready is unreliable and a full-image fetch costs ~0.4s,
    # so timing forces completion by fetching a 4-byte checksum instead.
    fn = jax.jit(lambda *a: jnp.sum(base(*a).astype(jnp.float32)))

    checksum = float(fn(*args))  # warmup / compile
    assert np.isfinite(checksum), (preset_name, view_precision, checksum)

    # Sustained throughput: keep 2 dispatches in flight so the tunnel's
    # ~25 ms round trip overlaps device compute (jax dispatch is async —
    # the fetch of call i blocks while call i+1 is already running).
    # Measured on v5e: 17.2 -> 21.3M rays/s, wall time == the device self
    # time from the profile, i.e. the device never idles — the number a
    # continuously-fed production server sees.
    rays = bs * n_views * res * res
    # >=3 windows for the headline (VERDICT r4 next #6): the tunnel's
    # run-to-run spread is ~±8%, so the headline is a median-of-windows
    # with the spread reported, not a single coin flip.  Each window
    # reuses the same compiled fn — one compile, `windows` measurements.
    per_window = []
    for _ in range(windows):
        futs = [fn(*args), fn(*args)]
        t0 = time.perf_counter()
        for _ in range(iters):
            futs.append(fn(*args))
            checksum = float(futs.pop(0))
            assert np.isfinite(checksum), (preset_name, view_precision,
                                           checksum)
        dt = (time.perf_counter() - t0) / iters
        for f in futs:
            assert np.isfinite(float(f))
        per_window.append(rays / dt)

    # free the 483M/205M params before the next config compiles
    del params, args, fn, futs
    if windows == 1:
        return per_window[0]
    return float(np.median(per_window)), sorted(round(w, 1)
                                                for w in per_window)


def main():
    import jax

    # persistent compile cache: remote TPU compiles of the 205M graph vary
    # between 4 and 12 minutes; cache hits cut reruns to seconds
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass

    platform = jax.devices()[0].platform
    impl = 'flash' if platform == 'tpu' else 'xla'

    # Wall-clock budget for the WHOLE run (VERDICT r3 weak #1: round 3's
    # run timed out mid-compile and emitted nothing).  The headline config
    # always runs; each extra config starts only if enough budget remains
    # for a worst-case cold compile (~12 min), else it is recorded as
    # skipped.  A fresh enriched JSON line is printed (and flushed) after
    # every completed config, so a driver timeout at ANY point still
    # leaves the latest complete result as the last line of output.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get('RFTPU_BENCH_BUDGET_S', '2400'))
    cold_compile_s = 750.0  # worst-case observed remote-TPU compile

    extra = {}

    def emit(headline):
        # measured same-host torch-CPU anchor (VERDICT r2 #10)
        anchor_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            'tools', 'torch_cpu_anchor.json')
        if os.path.exists(anchor_path) and 'torch_cpu_anchor_rays_per_s' not in extra:
            with open(anchor_path) as f:
                anchor = json.load(f)
            extra['torch_cpu_anchor_rays_per_s'] = anchor['torch_cpu_rays_per_s']
            extra['torch_cpu_anchor_provenance'] = anchor['provenance']
            extra['vs_torch_cpu_measured'] = round(
                headline / anchor['torch_cpu_rays_per_s'], 1)
        print(json.dumps({
            'metric': f'rays_per_s_512px_v1base_{platform}_{impl}',
            'value': round(headline, 1),
            'unit': 'rays/s/chip',
            'vs_baseline': round(headline / TORCH_GPU_RAYS_PER_S_ESTIMATE, 3),
            'extra': extra,
        }), flush=True)

    headline, spread = bench_config('v1-base', 'bf16', windows=3)
    extra['v1base_bf16_rays_per_s'] = round(headline, 1)
    extra['v1base_bf16_window_spread'] = spread
    emit(headline)  # the headline lands even if everything after times out

    if os.environ.get('RFTPU_BENCH_FAST', '0') != '1':
        for preset, view_prec, key in (
                ('v1.1-swin-large', 'bf16', 'swinlarge_bf16_rays_per_s'),
                ('v1-base', 'fp32', 'v1base_fp32view_rays_per_s'),
                ('v1.1-swin-large', 'fp32',
                 'swinlarge_fp32view_rays_per_s')):
            elapsed = time.perf_counter() - t_start
            if elapsed + cold_compile_s > budget_s:
                extra[key] = 'skipped: budget'
                continue
            try:
                extra[key] = round(bench_config(preset, view_prec), 1)
            except Exception as e:  # record, never lose the headline
                extra[key] = f'error: {type(e).__name__}: {e}'[:200]
            emit(headline)
        extra['bench_wall_s'] = round(time.perf_counter() - t_start, 1)
        emit(headline)


if __name__ == '__main__':
    sys.exit(main())
