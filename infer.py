"""Single-scene rendering CLI (parity with /root/reference/infer.py:33-106).

Usage:
    python infer.py --h5_file scene.h5 --model_id <dir|preset> \
        [--precision bf16] [--resolution 512] [--output_dir out] \
        [--tone_mapper agx]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(
        description='Infer using triangle radiosity transformer model (TPU)')
    parser.add_argument('--h5_file', type=str, required=True,
                        help='Path to the input H5 file')
    parser.add_argument('--model_id', type=str, default='v1-base',
                        help='Local checkpoint dir (config.json + '
                             'model.safetensors) or preset name')
    parser.add_argument('--precision', type=str,
                        choices=['bf16', 'fp16', 'fp32'], default='bf16',
                        help='Precision for inference (fp16 maps to bf16 on TPU)')
    parser.add_argument('--view_precision', type=str,
                        choices=['bf16', 'fp16', 'fp32'], default=None,
                        help='Stage-2 (view transformer + DPT) precision; '
                             'default = same as --precision. fp32 restores '
                             "the reference's TF32 view island (a CUDA-fp16 "
                             'overflow guard bf16 does not need — '
                             'tools/precision_study.py)')
    parser.add_argument('--resolution', type=int, default=512)
    parser.add_argument('--output_dir', type=str, required=False,
                        help='Output directory (default: same as input H5)')
    parser.add_argument('--tone_mapper', type=str,
                        choices=['none', 'agx', 'filmic', 'pbr_neutral'],
                        default='none')
    parser.add_argument('--attn_impl', type=str,
                        choices=['auto', 'xla', 'flash'], default='auto')
    parser.add_argument('--shard', action='store_true',
                        help='Shard inference over all visible devices '
                             '(GSPMD data x seq mesh)')
    parser.add_argument('--cpu', action='store_true',
                        help='Force the CPU backend')
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from renderformer_tpu.io.h5 import load_scene_h5
    from renderformer_tpu.io.image import write_exr, write_png
    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline
    from renderformer_tpu.utils.tone_map import ToneMapper

    pipeline = RenderingPipeline.from_pretrained(
        args.model_id, attn_impl=args.attn_impl)
    if args.shard:
        pipeline.use_mesh()
        print(f'sharded inference over mesh {pipeline.mesh.shape}')

    tone_mapper = None
    if args.tone_mapper != 'none':
        tone_mapper = ToneMapper(args.tone_mapper)
        print(f'Using {args.tone_mapper} tone mapper')

    data = load_scene_h5(args.h5_file)

    rendered = pipeline.render(
        triangles=data['triangles'][None],
        texture=data['texture'][None],
        mask=data['mask'][None],
        vn=data['vn'][None],
        c2w=data['c2w'][None],
        fov=data['fov'][None, :, None],
        resolution=args.resolution,
        precision=args.precision,
        view_precision=args.view_precision,
    )
    rendered = np.asarray(rendered)
    print('Inference completed. Rendered images shape:', rendered.shape)

    output_dir = args.output_dir or os.path.dirname(args.h5_file) or '.'
    os.makedirs(output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.h5_file))[0]

    for i in range(rendered.shape[1]):
        hdr = rendered[0, i].astype(np.float32)
        ldr = (tone_mapper.hdr_to_ldr(hdr) if tone_mapper
               else np.clip(hdr, 0, 1))
        ldr_u8 = (ldr * 255).astype(np.uint8)
        hdr_path = os.path.join(output_dir, f'{base}_view_{i}.exr')
        ldr_path = os.path.join(output_dir, f'{base}_view_{i}.png')
        write_exr(hdr_path, hdr)
        write_png(ldr_path, ldr_u8)
        print(f'Saved {hdr_path} and {ldr_path}')


if __name__ == '__main__':
    main()
