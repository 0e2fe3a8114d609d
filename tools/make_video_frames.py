"""Generate an N-frame camera-orbit H5 folder from an example scene.

The reference's video benchmark (render-videos.sh + batch_infer.py:61-178)
consumes folders of per-frame H5 scenes downloaded by
download_video_data.sh — unavailable here (zero egress). This tool
produces an equivalent workload locally: one example scene's geometry,
camera orbiting the look-at point across frames, one H5 per frame.

The orbit stays inside the trained envelope (camera distance 1.5-2.0,
fov 30-60, reference README.md:308): the radius and elevation of the
scene's own camera are kept, only the azimuth sweeps.

Usage:
    python tools/make_video_frames.py --scene examples/cbox.json \
        --out /tmp/rf_frames --frames 48 --arc 360
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', default='examples/cbox.json')
    ap.add_argument('--out', default='/tmp/rf_frames')
    ap.add_argument('--frames', type=int, default=48)
    ap.add_argument('--arc', type=float, default=360.0,
                    help='total azimuth sweep in degrees')
    args = ap.parse_args(argv)

    from renderformer_tpu.io.h5 import save_scene_h5
    from renderformer_tpu.scene.scene_config import load_scene_config
    from renderformer_tpu.scene.scene_mesh import generate_scene_meshes
    from renderformer_tpu.scene.to_h5 import scene_to_tensors
    from renderformer_tpu.utils.look_at import look_at_to_c2w

    cfg = load_scene_config(args.scene)
    meshes = generate_scene_meshes(cfg, os.path.dirname(
        os.path.abspath(args.scene)))
    base = scene_to_tensors(cfg, meshes)

    cam = cfg.cameras[0]
    pos = np.asarray(cam.position, np.float64)
    tgt = np.asarray(cam.look_at, np.float64)
    rel = pos - tgt
    radius_xy = float(np.hypot(rel[0], rel[1]))
    theta0 = float(np.arctan2(rel[1], rel[0]))
    z = float(rel[2])

    os.makedirs(args.out, exist_ok=True)
    fov = np.asarray([cam.fov], np.float32)
    for i in range(args.frames):
        theta = theta0 + np.deg2rad(args.arc) * i / args.frames
        p = tgt + np.array([radius_xy * np.cos(theta),
                            radius_xy * np.sin(theta), z])
        c2w = look_at_to_c2w(p, tgt, cam.up)[None].astype(np.float32)
        save_scene_h5(os.path.join(args.out, f'frame_{i:04d}.h5'),
                      base['triangles'], base['vn'], base['texture'],
                      c2w, fov)
    print(f'{args.frames} frames ({base["triangles"].shape[0]} tris each) '
          f'-> {args.out}')


if __name__ == '__main__':
    main()
