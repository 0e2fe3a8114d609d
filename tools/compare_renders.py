"""Compare two rendered images (EXR or PNG): PSNR + max abs diff.

Usage: python tools/compare_renders.py a.exr b.exr [--peak 1.0]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(path):
    if path.endswith('.exr'):
        from renderformer_tpu.io.image import read_exr
        return read_exr(path)
    import imageio
    return np.asarray(imageio.v3.imread(path), np.float32) / 255.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument('a')
    p.add_argument('b')
    p.add_argument('--peak', type=float, default=None)
    args = p.parse_args()
    a, b = load(args.a), load(args.b)
    if a.shape != b.shape:
        print(f'shape mismatch: {a.shape} vs {b.shape}')
        return 1
    mse = float(np.mean((a - b) ** 2))
    peak = args.peak or max(float(np.abs(a).max()), 1e-6)
    psnr = float('inf') if mse == 0 else 10 * np.log10(peak ** 2 / mse)
    print(f'PSNR: {psnr:.2f} dB  (mse={mse:.3e}, peak={peak:.3f}, '
          f'max|diff|={float(np.abs(a - b).max()):.3e})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
