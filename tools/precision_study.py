"""483M view-stage precision study (VERDICT round-2 #7).

The reference runs stage 2 in fp32-with-TF32 when the outer autocast is
half (/root/reference/pipelines/rendering_pipeline.py:99) — a CUDA-fp16
overflow mitigation. On TPU the half dtype is bf16 (fp32 dynamic range),
so the fp32 island may be pure cost: swin-large at fp32-view measured
8.1M rays/s vs 2.1x that at bf16-view (BENCH_r02).

This tool quantifies the numerical cost of bf16-view at full 483M size
on REAL scene geometry (a cbox frame from tools/make_video_frames.py):
renders all-fp32 (numerical reference), fp32-view (shipped default),
and bf16-view, and reports pairwise PSNR on the decoded HDR image and
on the PBR-neutral tone-mapped LDR image.

Caveat recorded in the output: weights are random-init (trained weights
unavailable in this environment, zero egress) — this measures numerical
drift of the architecture at size, not perceptual quality of trained
outputs.

Usage:
    python tools/make_video_frames.py --frames 1 --out /tmp/rf_frames1
    python tools/precision_study.py --preset v1.1-swin-large \
        --h5 /tmp/rf_frames1/frame_0000.h5 --res 512
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b, peak=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if peak is None:
        peak = max(a.max(), b.max(), 1e-12)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float('inf')
    return float(10.0 * np.log10(peak * peak / mse))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='v1.1-swin-large')
    ap.add_argument('--h5', default='/tmp/rf_frames/frame_0000.h5')
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--pad', type=int, default=4352,
                    help='triangle padding bucket')
    args = ap.parse_args(argv)

    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass

    from renderformer_tpu.io.h5 import load_scene_h5
    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline
    from renderformer_tpu.utils.tone_map import ToneMapper

    data = load_scene_h5(args.h5, args.pad)
    scene_args = (data['triangles'][None], data['texture'][None],
                  data['mask'][None], data['vn'][None],
                  data['c2w'][None], data['fov'][None, :, None])

    pipe = RenderingPipeline.from_pretrained(args.preset)

    def render(precision, view_precision):
        img = pipe.render(*scene_args, resolution=args.res,
                          precision=precision,
                          view_precision=view_precision)
        return np.asarray(jax.block_until_ready(img))[0, 0]

    ref = render('fp32', 'fp32')          # numerical reference
    fp32v = render('bf16', 'fp32')        # shipped default policy
    bf16v = render('bf16', 'bf16')        # candidate default

    tm = ToneMapper('pbr_neutral').hdr_to_ldr
    ldr_ref, ldr_fp32v, ldr_bf16v = tm(ref), tm(fp32v), tm(bf16v)
    out = {
        'preset': args.preset,
        'h5': args.h5,
        'resolution': args.res,
        'n_tris': int(data['mask'].sum()),
        'weights': 'random-init (trained weights unavailable: zero egress)',
        'psnr_hdr': {
            'fp32view_vs_fp32all': round(psnr(fp32v, ref), 2),
            'bf16view_vs_fp32all': round(psnr(bf16v, ref), 2),
            'bf16view_vs_fp32view': round(psnr(bf16v, fp32v), 2),
        },
        'psnr_ldr_pbr_neutral': {
            'fp32view_vs_fp32all': round(psnr(ldr_fp32v, ldr_ref, peak=1.0), 2),
            'bf16view_vs_fp32all': round(psnr(ldr_bf16v, ldr_ref, peak=1.0), 2),
            'bf16view_vs_fp32view': round(
                psnr(ldr_bf16v, ldr_fp32v, peak=1.0), 2),
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
