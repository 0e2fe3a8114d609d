"""TPU-native path tracer (scene/path_tracer.py) — the executable GT
renderer replacing the environment-blocked Blender path
(/root/reference/scene_processor/render_scene.py).  Physics checks:
primary emission, analytic direct lighting, shadowing, and NEE vs
brute-force estimator agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderformer_tpu.scene.path_tracer import (
    intersect, occluded, path_trace, texture_to_materials)


def _look_at_z(dist=3.0):
    """Camera at +Z looking toward the origin (Blender convention:
    camera looks down its -Z)."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = dist      # +Z position; -Z forward points at origin
    return c2w


def _quad(center, u, v, size):
    """Two triangles forming a size x size quad at `center` spanned by
    unit vectors u, v."""
    c = np.asarray(center, np.float32)
    u = np.asarray(u, np.float32) * size / 2
    v = np.asarray(v, np.float32) * size / 2
    p00, p01 = c - u - v, c - u + v
    p10, p11 = c + u - v, c + u + v
    return np.stack([
        np.stack([p00, p10, p11]),
        np.stack([p00, p11, p01]),
    ]).astype(np.float32)


def test_intersect_basic():
    tris = jnp.asarray(_quad([0, 0, 0], [1, 0, 0], [0, 1, 0], 2.0))
    o = jnp.asarray([[0.0, 0.0, 3.0], [5.0, 5.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, idx, hit = intersect(o, d, tris, jnp.ones(2, bool))
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-5)


def test_primary_emission_exact():
    """A pixel seeing an emitter directly reads the emitted radiance
    exactly (no MC noise on the primary term)."""
    tris = jnp.asarray(_quad([0, 0, 0], [1, 0, 0], [0, 1, 0], 2.0))
    emissive = jnp.asarray([[2.0, 3.0, 4.0]] * 2)
    diffuse = jnp.zeros((2, 3))
    img = path_trace(
        tris, tris, jnp.ones(2, bool), diffuse, emissive,
        jnp.asarray(_look_at_z()), jnp.float32(np.deg2rad(40.0)),
        jax.random.key(0), resolution=16, spp=2, max_depth=1)
    center = np.asarray(img)[8, 8]
    np.testing.assert_allclose(center, [2.0, 3.0, 4.0], rtol=1e-5)


def test_direct_lighting_analytic():
    """Floor point directly under a small emitter: NEE estimate matches
    the analytic point-to-small-patch integral
    L = albedo/pi * E * cos0 * cos1 * A / d^2."""
    floor = _quad([0, 0, 0], [1, 0, 0], [0, 0, -1], 4.0)   # y=0, n=+y
    h, s = 2.0, 0.05                                        # tiny light
    light = _quad([0, h, 0], [1, 0, 0], [0, 0, 1], s)       # facing -y
    tris = jnp.asarray(np.concatenate([floor, light]))
    diffuse = jnp.asarray([[0.6, 0.5, 0.4]] * 2 + [[0.0] * 3] * 2)
    E = 500.0
    emissive = jnp.asarray([[0.0] * 3] * 2 + [[E] * 3] * 2)

    # camera above, looking straight down at the floor center
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32).T
    c2w[1, 3] = 1.0       # y=+1, looking down -y... build via axes:
    # forward -Z_cam must be -y_world => Z_cam = +y; X_cam = +x; Y_cam = -z
    R = np.stack([np.array([1, 0, 0]), np.array([0, 0, -1]),
                  np.array([0, 1, 0])], axis=1).astype(np.float32)
    c2w[:3, :3] = R
    img = path_trace(
        tris, tris, jnp.ones(4, bool), diffuse, emissive,
        jnp.asarray(c2w), jnp.float32(np.deg2rad(30.0)),
        jax.random.key(1), resolution=8, spp=128, max_depth=1)
    got = np.asarray(img)[4, 4]   # floor point near origin
    # analytic: cos0 = cos1 = 1 (directly below), d = h, A = s^2
    want = np.asarray(diffuse[0]) / np.pi * E * (s * s) / (h * h)
    np.testing.assert_allclose(got, want, rtol=0.08)


def test_shadowing():
    """An occluder between light and floor darkens the floor."""
    floor = _quad([0, 0, 0], [1, 0, 0], [0, 0, -1], 4.0)
    light = _quad([0, 2.0, 0], [1, 0, 0], [0, 0, 1], 0.3)
    blocker = _quad([0, 1.0, 0], [1, 0, 0], [0, 0, 1], 1.2)
    E = 200.0

    def render(with_blocker):
        if with_blocker:
            tris = np.concatenate([floor, light, blocker])
            diffuse = [[0.6] * 3] * 2 + [[0.0] * 3] * 2 + [[0.0] * 3] * 2
            emissive = [[0.0] * 3] * 2 + [[E] * 3] * 2 + [[0.0] * 3] * 2
        else:
            tris = np.concatenate([floor, light])
            diffuse = [[0.6] * 3] * 2 + [[0.0] * 3] * 2
            emissive = [[0.0] * 3] * 2 + [[E] * 3] * 2
        n = len(tris)
        R = np.stack([np.array([1, 0, 0]), np.array([0, 0, -1]),
                      np.array([0, 1, 0])], axis=1).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R
        c2w[1, 3] = 0.5
        return np.asarray(path_trace(
            jnp.asarray(tris), jnp.asarray(tris), jnp.ones(n, bool),
            jnp.asarray(diffuse, jnp.float32),
            jnp.asarray(emissive, jnp.float32),
            jnp.asarray(c2w), jnp.float32(np.deg2rad(50.0)),
            jax.random.key(2), resolution=8, spp=64, max_depth=1))

    lit = render(False)[4, 4]
    shadowed = render(True)[4, 4]
    assert lit.mean() > 1e-3
    assert shadowed.mean() < 0.05 * lit.mean(), (lit, shadowed)


def test_nee_matches_bruteforce():
    """NEE and brute-force estimators agree in expectation (cbox-like
    box, one bounce of indirect light)."""
    box = []
    mats_d, mats_e = [], []
    # floor, ceiling, back, left (red), right (green)
    for c, u, v, alb in [
            ([0, -1, 0], [1, 0, 0], [0, 0, -1], [0.7, 0.7, 0.7]),
            ([0, 1, 0], [1, 0, 0], [0, 0, 1], [0.7, 0.7, 0.7]),
            ([0, 0, -1], [1, 0, 0], [0, 1, 0], [0.7, 0.7, 0.7]),
            ([-1, 0, 0], [0, 0, 1], [0, 1, 0], [0.7, 0.1, 0.1]),
            ([1, 0, 0], [0, 0, -1], [0, 1, 0], [0.1, 0.7, 0.1])]:
        box.append(_quad(c, u, v, 2.0))
        mats_d += [alb] * 2
        mats_e += [[0.0] * 3] * 2
    box.append(_quad([0, 0.98, 0], [1, 0, 0], [0, 0, 1], 0.6))
    mats_d += [[0.0] * 3] * 2
    mats_e += [[40.0] * 3] * 2
    tris = jnp.asarray(np.concatenate(box))
    n = tris.shape[0]
    diffuse = jnp.asarray(mats_d, jnp.float32)
    emissive = jnp.asarray(mats_e, jnp.float32)
    c2w = jnp.asarray(_look_at_z(2.8))
    fov = jnp.float32(np.deg2rad(45.0))

    a = np.asarray(path_trace(tris, tris, jnp.ones(n, bool), diffuse,
                              emissive, c2w, fov, jax.random.key(3),
                              resolution=8, spp=256, max_depth=2,
                              nee=True))
    b = np.asarray(path_trace(tris, tris, jnp.ones(n, bool), diffuse,
                              emissive, c2w, fov, jax.random.key(4),
                              resolution=8, spp=4096, max_depth=2,
                              nee=False))
    # compare image means (pixelwise brute-force variance is huge)
    np.testing.assert_allclose(a.mean(axis=(0, 1)), b.mean(axis=(0, 1)),
                               rtol=0.12)


def test_texture_to_materials():
    tex = np.zeros((3, 13, 32, 32), np.float32)
    tex[:, 0:3] = 0.25
    tex[1, 10:13] = 8.0
    d, e = texture_to_materials(tex)
    np.testing.assert_allclose(np.asarray(d), 0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e)[1], 8.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e)[0], 0.0, atol=1e-8)
