"""Speed-of-light / roofline analysis of the render workload.

Closes the BASELINE.json "triangle-token + pixel-patch token/s per chip |
speed-of-light analysis vs roofline" row: lowers the REAL render graph,
pulls FLOP and HBM-byte counts from XLA's cost analysis, measures wall
time on the attached chip, and reports achieved TFLOP/s and GB/s against
the chip's peaks, plus the rays/s and token/s counters.

FLOPs are counted on the ``impl='xla'`` lowering (mathematically the same
graph; Pallas custom-calls are opaque to XLA's cost model) while timing
runs the shipped ``impl='flash'`` path.

Usage:
    python tools/roofline.py [--preset v1-base] [--res 512] [--views 8]
        [--tris 2048] [--view-precision bf16] [--iters 5] [--no-measure]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU generation peaks (dense, per chip).
CHIP_PEAKS = {
    # name: (bf16 TFLOP/s, HBM GB/s)
    'v5e': (197.0, 819.0),
    'v5p': (459.0, 2765.0),
    'v4': (275.0, 1228.0),
    'v6e': (918.0, 1640.0),
}

# Measured-on-v5e per-class efficiency ceilings for the ACHIEVABLE bound
# (VERDICT r4 next #5).  The FLOP-only SOL counts softmax/VPU work and
# layout passes as free and assumes every FLOP runs at the MXU peak; no
# real program can reach it.  These ceilings are what each op class
# achieves IN ISOLATION at the model's shapes on this chip:
#   dense  0.95 — decoder FFN fusions measure 94-98% of the matmul roof
#                 (docs/performance.md round-4/5 profiles)
#   conv   0.74 — XLA conv emitter bound, measured on the composed s2d
#                 DPT tail (fusion.16: 4.2 ms vs 3.1 ms ideal)
#   attn   0.95 — flash kernel matmul efficiency at 4096^2 unmasked
#                 (tools/cross_micro.py); the masked-site shortfall is
#                 the VPU softmax, priced separately below
#   vpu_softmax 8.0e11 elem/s — from the measured masked-cross kernel:
#                 0.7 ms of non-matmul time over 5.7e8 score elements
#   hbm    0.80 — sustained fraction of peak HBM for streaming passes
CLASS_EFF = {'dense': 0.95, 'conv': 0.74, 'attn': 0.95}
VPU_SOFTMAX_ELEM_S = 8.0e11
HBM_EFF = 0.80


def achievable_model(cfg, res: int, views: int, tris: int,
                     peak_tflops: float, peak_gbs: float) -> dict:
    """Analytic per-class cost model of one render — the 'achievable'
    wall: each class of work priced at its measured ceiling instead of
    the MXU peak.  Component FLOP counts follow the architecture
    (SURVEY.md §2.2); cross-checked against XLA cost analysis (the
    report prints both totals)."""
    d1, h1, f1, l1 = (cfg.latent_dim, cfg.num_heads, cfg.dim_feedforward,
                      cfg.num_layers)
    d2 = cfg.view_transformer_latent_dim
    f2 = cfg.view_transformer_ffn_hidden_dim
    l2 = cfg.view_transformer_n_layers
    h2 = cfg.view_transformer_n_heads
    s1 = tris + cfg.num_register_tokens
    s2 = (res // cfg.patch_size) ** 2
    v = views
    ps = cfg.texture_encode_patch_size

    dense = 0.0
    # stage 1: token embeds + 12 layers (qkv/out + swiglu ffn)
    dense += 2 * tris * (13 * ps * ps) * d1           # texture embed
    dense += 2 * tris * 117 * d1                      # vn nerf embed
    dense += l1 * s1 * (8 * d1 * d1 + 6 * d1 * f1)
    # stage 2 per view: patch embed + decoder layers
    dense += v * 2 * s2 * (3 * cfg.patch_size ** 2) * d2
    per_layer = (2 * s2 * d2 * d2 * 2        # cross q + out proj
                 + 2 * s2 * d2 * d2 * 4      # self qkv + out
                 + 2 * 3 * s2 * d2 * f2)     # swiglu ffn
    dense += v * l2 * per_layer
    dense += l2 * 2 * s1 * 2 * d2 * d2       # shared per-scene k/v proj
    # DPT 1x1 projections of the 4 taps
    dense += v * 2 * s2 * d2 * sum(cfg.dpt_out_channels)

    # attention matmuls (QK^T + PV)
    attn = l1 * 4 * s1 * s1 * d1             # stage-1 self
    attn += v * l2 * 4 * s2 * s1 * d2        # cross
    if cfg.view_transformer_use_swin_attn:
        attn += v * l2 * 4 * s2 * 64 * d2    # 8x8 windows
    else:
        attn += v * l2 * 4 * s2 * s2 * d2

    # softmax elements (priced on the VPU, not the MXU)
    softmax_elems = (l1 * h1 * s1 * s1
                     + v * l2 * h2 * s2 * s1
                     + v * l2 * h2 * s2
                     * (64 if cfg.view_transformer_use_swin_attn else s2))

    # DPT conv chain (reference dpt.py:174-273 structure): scratch 3x3
    # convs at the resized taps, 4 refinenet fusion blocks with 2 RCUs
    # (2 convs each) per resolution, 3x3 output convs at full res
    feat = cfg.dpt_features
    grid = res // cfg.patch_size
    resolutions = [grid * 4, grid * 2, grid, grid // 2]
    conv = 0.0
    for r_i, c_i in zip(resolutions, cfg.dpt_out_channels):
        conv += v * 2 * 9 * r_i * r_i * c_i * feat          # scratch
        conv += v * 4 * 2 * 9 * r_i * r_i * feat * feat     # RCUs
    conv += v * 2 * 9 * res * res * feat * feat             # out conv1
    conv += v * 2 * 9 * res * res * feat * 32               # out conv2a
    conv += v * 2 * res * res * 32 * 3                      # out conv2b

    # bandwidth-bound streaming passes (2 bytes bf16, read+write):
    # norms (3/decoder layer + 2 qk-norms, 2/encoder layer + qk), rope
    # tables (fp32), residual adds, swin regroups (6 shifted layers x
    # 3 passes)
    bts = 0.0
    bts += l1 * 5 * (s1 * d1 * 2 * 2)
    bts += v * l2 * 7 * (s2 * d2 * 2 * 2)
    # rope cos/sin tables, head-shared [B, S, head_dim] fp32 (2 tables,
    # q-side per view + ctx-side per view, written once + read by the
    # kernel per head... priced as one r+w pass each)
    hd2 = d2 // h2
    bts += v * l2 * 2 * ((s2 + s1) * hd2 * 4 * 2)
    if cfg.view_transformer_use_swin_attn:
        bts += v * (l2 // 2) * 2 * 3 * (s2 * d2 * 2)        # regroups

    t_dense = dense / (CLASS_EFF['dense'] * peak_tflops * 1e12)
    t_attn = attn / (CLASS_EFF['attn'] * peak_tflops * 1e12)
    t_conv = conv / (CLASS_EFF['conv'] * peak_tflops * 1e12)
    t_vpu = softmax_elems / VPU_SOFTMAX_ELEM_S
    t_hbm = bts / (HBM_EFF * peak_gbs * 1e9)
    total = t_dense + t_attn + t_conv + t_vpu + t_hbm
    return {
        'model_tflop': round((dense + attn + conv) / 1e12, 3),
        'achievable_ms': round(total * 1e3, 2),
        'breakdown_ms': {
            'dense_matmul': round(t_dense * 1e3, 2),
            'attention_matmul': round(t_attn * 1e3, 2),
            'conv': round(t_conv * 1e3, 2),
            'vpu_softmax': round(t_vpu * 1e3, 2),
            'streaming_passes': round(t_hbm * 1e3, 2),
        },
        'assumptions': {
            'class_efficiency': CLASS_EFF,
            'vpu_softmax_elem_per_s': VPU_SOFTMAX_ELEM_S,
            'hbm_sustained_fraction': HBM_EFF,
        },
    }


def _flop_count(fn, args):
    """XLA cost analysis of the lowered graph (CPU lowering is fine for
    counting — the HLO math is platform-independent)."""
    import jax
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get('flops', 0.0)), float(
        cost.get('bytes accessed', 0.0))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='v1-base')
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--views', type=int, default=8)
    ap.add_argument('--tris', type=int, default=2048)
    ap.add_argument('--view-precision', default='bf16',
                    choices=['bf16', 'fp32'])
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--no-measure', action='store_true',
                    help='analysis only (no TPU timing); useful on CPU')
    ap.add_argument('--chip', default=None,
                    help='override chip generation (default: autodetect)')
    args = ap.parse_args(argv)

    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass

    from renderformer_tpu.config import PRESETS
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.pipelines.rendering_pipeline import render_fn

    cfg = PRESETS[args.preset]
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(0))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params))

    bs, n_tris, n_views, res = 1, args.tris, args.views, args.res
    rng = np.random.default_rng(0)
    base_args = (
        params,
        jnp.asarray(rng.normal(size=(bs, n_tris, 3, 3)), jnp.float32) * 0.3,
        jnp.asarray(rng.uniform(0, 1, (bs, n_tris, 13, 32, 32)), jnp.float32),
        jnp.ones((bs, n_tris), bool),
        jnp.asarray(rng.normal(size=(bs, n_tris, 3, 3)), jnp.float32),
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (bs, n_views, 1, 1))),
        jnp.full((bs, n_views, 1), 40.0, jnp.float32),
    )
    view_dtype = (jnp.float32 if args.view_precision == 'fp32'
                  else jnp.bfloat16)

    def make(impl):
        base = partial(render_fn, model=model, resolution=res,
                       dtype=jnp.bfloat16, view_dtype=view_dtype, impl=impl)
        return lambda *a: jnp.sum(base(*a).astype(jnp.float32))

    flops, hbm_bytes = _flop_count(make('xla'), base_args)

    # Workload counters.
    rays = bs * n_views * res * res
    tri_tokens = bs * (n_tris + cfg.num_register_tokens)
    patch_tokens = bs * n_views * (res // cfg.patch_size) ** 2

    chip = args.chip or os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')
    peak_tflops, peak_gbs = CHIP_PEAKS.get(chip, CHIP_PEAKS['v5e'])

    report = {
        'preset': args.preset,
        'workload': {'res': res, 'views': n_views, 'tris': n_tris,
                     'view_precision': args.view_precision},
        'params_millions': round(n_params / 1e6, 1),
        'tflop_per_render': round(flops / 1e12, 3),
        # XLA's "bytes accessed" sums every op's operand bytes, so for a
        # fused graph it is a loose UPPER bound on real HBM traffic —
        # useful only to show the workload is compute- not HBM-bound.
        'hbm_gb_per_render_xla_upper_bound': round(hbm_bytes / 1e9, 3),
        'arithmetic_intensity_flop_per_byte_lower_bound': round(
            flops / hbm_bytes, 1),
        'chip': chip,
        'peak_tflops_bf16': peak_tflops,
        'peak_hbm_gbs': peak_gbs,
        # speed-of-light wall for the dominant (compute) roof
        'sol_ms_compute': round(flops / (peak_tflops * 1e12) * 1e3, 2),
        # achievable wall: per-class measured ceilings + VPU softmax +
        # streaming passes (VERDICT r4 next #5) — the bound a perfect
        # implementation of THIS architecture could actually reach
        'achievable': achievable_model(cfg, res, n_views, n_tris,
                                       peak_tflops, peak_gbs),
    }

    if not args.no_measure:
        platform = jax.devices()[0].platform
        impl = 'flash' if platform == 'tpu' else 'xla'
        fn = jax.jit(make(impl))
        # pre-cast weights like the product path (see bench.py): fp32
        # masters fed into the jit leave f32 weights streaming into the
        # down-proj fusions (47% MXU vs 95% pre-cast)
        from renderformer_tpu.nn.core import cast_params
        dev_params = jax.device_put({
            **cast_params({k: v for k, v in params.items()
                           if k != 'view_transformer'}, jnp.bfloat16),
            'view_transformer': cast_params(params['view_transformer'],
                                            view_dtype),
        })
        run_args = (dev_params,) + base_args[1:]
        checksum = float(fn(*run_args))
        assert np.isfinite(checksum)
        # pipelined dispatch (2 in flight), matching bench.py: measures
        # sustained device throughput, not tunnel round trips
        futs = [fn(*run_args), fn(*run_args)]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            futs.append(fn(*run_args))
            checksum = float(futs.pop(0))
            assert np.isfinite(checksum)
        dt = (time.perf_counter() - t0) / args.iters
        for f in futs:
            float(f)
        report.update({
            'platform': platform,
            'impl': impl,
            'measured_ms': round(dt * 1e3, 2),
            'achieved_tflops': round(flops / dt / 1e12, 1),
            'pct_of_peak_compute': round(100 * flops / dt / (peak_tflops * 1e12), 1),
            'rays_per_s': round(rays / dt, 0),
            'triangle_tokens_per_s': round(tri_tokens / dt, 0),
            'patch_tokens_per_s': round(patch_tokens / dt, 0),
            'sol_headroom_x': round(dt * 1e3 / report['sol_ms_compute'], 2),
            'pct_of_compute_sol': round(
                100 * report['sol_ms_compute'] / (dt * 1e3), 1),
            'pct_of_achievable': round(
                100 * report['achievable']['achievable_ms'] / (dt * 1e3),
                1),
        })

    print(json.dumps(report, indent=2))


if __name__ == '__main__':
    sys.exit(main())
