"""Checkpoint conversion CLI: reference PyTorch -> renderformer_tpu.

Usage:
    python -m renderformer_tpu.convert <torch_ckpt_dir> <out_dir>

The input dir is an HF-format reference checkpoint (config.json +
model.safetensors, as downloaded from microsoft/renderformer-*). The
output dir is loadable by ``RenderingPipeline.from_pretrained``.
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(
        description='Convert reference torch checkpoint to JAX format')
    parser.add_argument('input_dir', help='HF dir with config.json + model.safetensors')
    parser.add_argument('output_dir', help='output dir (JAX format)')
    args = parser.parse_args()

    from renderformer_tpu.convert.torch_to_jax import load_pretrained
    from renderformer_tpu.training.checkpoint import export_params
    from renderformer_tpu.nn.core import param_count

    cfg, params = load_pretrained(args.input_dir)
    export_params(args.output_dir, params, cfg)
    print(f'converted {param_count(params) / 1e6:.1f}M params '
          f'-> {args.output_dir}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
