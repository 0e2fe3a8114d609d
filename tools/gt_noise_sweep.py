"""Quantify path-traced GT noise vs spp (VERDICT r4 next #8).

Renders 2-3 dataset scenes at spp in {8..256}, with and without the
firefly clamp, and reports PSNR against a high-spp (1024, unclamped)
reference render of the same scene/view — so the fine-tune dataset's
spp can be chosen deliberately and the training loss floor can be
attributed (model error vs GT noise).

Usage:
    python tools/gt_noise_sweep.py [--h5_dir datasets/ft128/h5]
        [--scenes 3] [--resolution 256] [--out docs/training.md]

Appends/updates a '## Path-traced GT noise vs spp' section in --out.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    """LDR PSNR (peak 1) on [0,1]-clipped images — the metric the
    training loop actually sees: generate_dataset writes GT as
    clip(img, 0, 1) PNGs.  (A peak=max(ref) HDR PSNR swings by >20 dB
    with whether a bright light texel lands in the view — useless for
    cross-run comparison.)"""
    import numpy as np
    a = np.clip(a, 0.0, 1.0)
    b = np.clip(b, 0.0, 1.0)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float('inf')
    return 10.0 * np.log10(1.0 / mse)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--h5_dir', default='datasets/ft128/h5')
    ap.add_argument('--scenes', type=int, default=3)
    ap.add_argument('--resolution', type=int, default=256)
    ap.add_argument('--ref_spp', type=int, default=1024)
    ap.add_argument('--spps', default='8,16,32,64,128,256')
    ap.add_argument('--clamp', type=float, default=10.0)
    ap.add_argument('--out', default=None,
                    help='markdown file to update (section replace)')
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass
    from renderformer_tpu.io.h5 import list_scene_files, load_scene_h5
    from renderformer_tpu.scene.path_tracer import render_scene_pathtrace

    files = list_scene_files(args.h5_dir)[:args.scenes]
    if not files:
        raise SystemExit(f'no scenes under {args.h5_dir}')
    spps = [int(s) for s in args.spps.split(',')]

    def render_accum(scene, spp_total, seed0, clamp):
        """Average over 64-spp chunks with distinct seeds: identical
        estimator to one spp_total call, but each device program stays
        short (a single 512-spp program tripped the tunnel watchdog)."""
        chunk = min(64, spp_total)
        sizes = [chunk] * (spp_total // chunk)
        if spp_total % chunk:
            sizes.append(spp_total % chunk)  # weighted remainder chunk
        acc, total = None, 0
        for i, sz in enumerate(sizes):
            img = render_scene_pathtrace(
                scene, view=0, resolution=args.resolution, spp=sz,
                seed=seed0 + i, clamp=clamp) * sz
            acc = img if acc is None else acc + img
            total += sz
        return acc / total

    rows = []
    biases = []
    for f in files:
        # shared padding bucket: every scene compiles the same tracer
        # shapes, so the (spp, clamp)-keyed jit cache is hit across
        # scenes instead of recompiling 12x per scene
        scene = load_scene_h5(f, padding_length=4096)
        name = os.path.splitext(os.path.basename(f))[0]
        # Like-for-like references: clamped arms vs a clamped reference
        # (the GT pipeline renders WITH clamp — its noise is the
        # training-relevant number), unclamped vs unclamped.  The clamp
        # BIAS is reported separately as ref_c vs ref_u.  NB the
        # unclamped v2 estimator is heavy-tailed for the dataset's
        # bright-large-light envelope (BSDF-side emission pickups), so
        # its column converges slowly — that is the measurement, and
        # exactly why generate_dataset clamps.
        ref_u = render_accum(scene, args.ref_spp, 999, 0.0)
        ref_c = render_accum(scene, args.ref_spp, 999, args.clamp)
        biases.append((name, psnr(ref_c, ref_u)))
        print(f'{name}: clamp bias (ref_c vs ref_u, {args.ref_spp} spp) '
              f'= {biases[-1][1]:.1f} dB LDR', flush=True)
        for spp in spps:
            img0 = render_accum(scene, spp, 1, 0.0)
            imgc = render_accum(scene, spp, 1, args.clamp)
            rows.append((name, spp, psnr(img0, ref_u), psnr(imgc, ref_c)))
            print(f'{name} spp={spp}: PSNR {rows[-1][2]:.1f} dB '
                  f'(clamped {rows[-1][3]:.1f} dB)', flush=True)

    lines = [
        '## Path-traced GT noise vs spp',
        '',
        f'LDR PSNR (peak 1, [0,1]-clipped — the form the training GT',
        f'PNGs are written in) of a single render vs a {args.ref_spp}-spp',
        f'unclamped reference of the same view, {args.resolution}^2'
        ' (tools/gt_noise_sweep.py).'
        f'  Clamp = {args.clamp} is the generate_dataset default.',
        '',
        '| scene | spp | PSNR vs unclamped ref (dB) |'
        ' PSNR, clamped vs clamped ref (dB) |',
        '|---|---|---|---|',
    ]
    for name, spp, p0, pc in rows:
        lines.append(f'| {name} | {spp} | {p0:.1f} | {pc:.1f} |')
    lines.append('')
    for name, b in biases:
        lines.append(f'* {name}: clamp-{args.clamp:g} bias vs the '
                     f'unclamped estimator: {b:.1f} dB LDR at '
                     f'{args.ref_spp} spp')
    lines.append('')
    block = '\n'.join(lines)

    if args.out:
        marker = '## Path-traced GT noise vs spp'
        text = open(args.out).read() if os.path.exists(args.out) else ''
        if marker in text:
            head, rest = text.split(marker, 1)
            nxt = rest.find('\n## ')
            tail = rest[nxt + 1:] if nxt >= 0 else ''
            text = head + block + ('\n' + tail if tail else '')
        else:
            text = text.rstrip() + '\n\n' + block
        with open(args.out, 'w') as f:
            f.write(text)
        print(f'updated {args.out}')


if __name__ == '__main__':
    sys.exit(main())
