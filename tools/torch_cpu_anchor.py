"""Measure the torch reference's rays/s on THIS host's CPU and write the
anchor to tools/torch_cpu_anchor.json for bench.py (VERDICT r2 next #10:
the vs_baseline ratio must rest on a measurement, not a docstring
estimate).

Protocol: the reference pipeline (random v1-base weights, fp32 — CUDA
fp16/TF32 paths don't exist on CPU) renders one 256^2 view of a
2048-triangle scene; rays/s = 256^2 / wall.  256^2 anchors torch HIGH
relative to 512^2 (stage-2 attention is superlinear in ray tokens), so
ratios computed against it are conservative.  The torch-GPU estimate in
bench.py remains a separate, clearly-labeled nominal scale.

Usage: python tools/torch_cpu_anchor.py [--res 256] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), 'tests'))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--tris', type=int, default=2048)
    ap.add_argument('--iters', type=int, default=2)
    ap.add_argument('--out', default=os.path.join(HERE,
                                                  'torch_cpu_anchor.json'))
    args = ap.parse_args(argv)

    import numpy as np
    import torch
    from conftest import import_reference
    import_reference()
    from renderformer.models.config import RenderFormerConfig as TorchConfig
    from renderformer.models.renderformer import RenderFormer as TorchRF
    from renderformer.utils.ray_generator import RayGenerator

    torch.manual_seed(0)
    tmodel = TorchRF(TorchConfig()).eval()  # v1-base architecture defaults
    n_params = sum(p.numel() for p in tmodel.parameters())

    rng = np.random.default_rng(0)
    n, res = args.tris, args.res
    tris = torch.from_numpy(
        rng.normal(size=(1, n, 9)).astype(np.float32) * 0.3)
    tex = torch.from_numpy(
        rng.uniform(0, 1, (1, n, 13, 32, 32)).astype(np.float32))
    mask = torch.ones(1, n, dtype=torch.bool)
    vn = torch.from_numpy(rng.normal(size=(1, n, 9)).astype(np.float32))
    eye = torch.eye(4).reshape(1, 1, 4, 4)
    fov = torch.full((1, 1, 1), 40.0) / 180.0 * torch.pi
    rays_o, rays_d = RayGenerator()(eye, fov, res)

    def render():
        with torch.no_grad():
            return tmodel(tris, tex, mask, vn, rays_o=rays_o, rays_d=rays_d,
                          tri_vpos_view_tf=tris[:, None])

    render()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = render()
    dt = (time.perf_counter() - t0) / args.iters
    assert torch.isfinite(out).all()
    rays_per_s = res * res / dt

    payload = {
        'torch_cpu_rays_per_s': round(rays_per_s, 1),
        'resolution': res,
        'n_tris': n,
        'n_params': n_params,
        'seconds_per_view': round(dt, 3),
        'host': platform.processor() or platform.machine(),
        'cpu_count': os.cpu_count(),
        'torch_version': torch.__version__,
        'provenance': 'tools/torch_cpu_anchor.py: reference model '
                      '(random v1-base weights, fp32, sdpa) on this host; '
                      '256^2 anchors torch HIGH vs 512^2 -> conservative '
                      'ratios',
    }
    with open(args.out, 'w') as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == '__main__':
    sys.exit(main())
