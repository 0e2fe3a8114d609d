"""Record the end-to-end golden render (VERDICT r3 next #8).

Renders the v1-base preset at full architecture size with fixed-seed
random weights (jax.random.key(0) — the same init every
``RenderingPipeline.from_pretrained('v1-base')`` produces) through the
REAL user path (RenderingPipeline.render, fp32, CPU, 128^2) on a fixed
procedural scene, and records a downsampled fp32 image + summary stats
to tests/data/golden_e2e_v1base.npz.

tests/test_golden_recorded.py replays the render and PSNR-checks it
against this recording — so any regression anywhere in the
config -> init -> pipeline -> model -> DPT -> HDR-decode chain is caught
without the torch reference, and the day real released weights exist,
tools/verify_checkpoint.py is a one-command proof on top of a pinned
pipeline.

Re-run this tool ONLY when an intentional numeric change is made; commit
the refreshed npz together with the change that caused it.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=1').strip()
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402


def golden_scene(n=96, v=2, seed=7):
    """Deterministic procedural scene: a jittered triangle shell around
    the origin with two orbit cameras — real geometry statistics without
    any asset files."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n, 3)).astype(np.float32)
    centers /= np.maximum(np.linalg.norm(centers, axis=-1, keepdims=True), 1e-6)
    tris = centers[:, None, :] + 0.15 * rng.normal(size=(n, 3, 3)).astype(np.float32)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-8)
    vn = np.repeat(fn[:, None, :], 3, axis=1).astype(np.float32)
    tex = rng.uniform(0, 1, (n, 13, 32, 32)).astype(np.float32)
    tex[:4, 10:13] *= 30.0  # a few emitters for HDR range
    c2ws = []
    for i in range(v):
        ang = 2 * np.pi * i / v
        eye = np.array([2.5 * np.cos(ang), 0.6, 2.5 * np.sin(ang)], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(np.array([0, 1, 0], np.float32), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, eye
        c2ws.append(c2w)
    return dict(
        triangles=tris[None],
        texture=tex[None],
        mask=np.ones((1, n), bool),
        vn=vn[None],
        c2w=np.stack(c2ws)[None],
        fov=np.full((1, v, 1), 40.0, np.float32),
    )


def render_golden(res=128):
    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline
    pipe = RenderingPipeline.from_pretrained('v1-base', attn_impl='xla')
    s = golden_scene()
    img = np.asarray(pipe.render(
        s['triangles'], s['texture'], s['mask'], s['vn'], s['c2w'], s['fov'],
        resolution=res, precision='fp32', view_precision='fp32'))
    return img  # [1, V, H, W, 3] HDR fp32


def main():
    img = render_golden()
    ds = img[:, :, ::4, ::4, :]  # 32x32 downsample: small, still pins values
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'data',
        'golden_e2e_v1base.npz')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, downsampled=ds.astype(np.float32),
        mean=np.float32(img.mean()), std=np.float32(img.std()),
        p99=np.float32(np.percentile(img, 99)),
        resolution=np.int32(128))
    print(f'wrote {out}: mean={img.mean():.6f} std={img.std():.6f} '
          f'p99={np.percentile(img, 99):.4f} shape={img.shape}')


if __name__ == '__main__':
    main()
