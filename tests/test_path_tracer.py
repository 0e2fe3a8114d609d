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


def _flat_vn(tris):
    """Flat-shading vn: the face normal stored at all three vertices
    (the path tracer interpolates vn for shading normals since v2)."""
    t = np.asarray(tris)
    n = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return jnp.asarray(np.repeat(n[:, None, :], 3, axis=1), jnp.float32)


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
        tris, _flat_vn(tris), jnp.ones(2, bool), diffuse, emissive,
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
        tris, _flat_vn(tris), jnp.ones(4, bool), diffuse, emissive,
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
            jnp.asarray(tris), _flat_vn(tris), jnp.ones(n, bool),
            jnp.asarray(diffuse, jnp.float32),
            jnp.asarray(emissive, jnp.float32),
            jnp.asarray(c2w), jnp.float32(np.deg2rad(50.0)),
            jax.random.key(2), resolution=8, spp=64, max_depth=1))

    lit = render(False)[4, 4]
    shadowed = render(True)[4, 4]
    assert lit.mean() > 1e-3
    assert shadowed.mean() < 0.05 * lit.mean(), (lit, shadowed)


@pytest.mark.slow
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

    a = np.asarray(path_trace(tris, _flat_vn(tris), jnp.ones(n, bool), diffuse,
                              emissive, c2w, fov, jax.random.key(3),
                              resolution=8, spp=256, max_depth=2,
                              nee=True))
    b = np.asarray(path_trace(tris, _flat_vn(tris), jnp.ones(n, bool), diffuse,
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
    d, sp, ro, e = texture_to_materials(tex)
    np.testing.assert_allclose(np.asarray(d), 0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e)[1], 8.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e)[0], 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sp), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ro), 0.0, atol=1e-8)


# ---------------------------------------------------------------------------
# v2: GGX specular + shading normals + MIS (VERDICT r4 next #2)
# ---------------------------------------------------------------------------

def _emissive_box(L=1.0, size=6.0):
    """Closed cube of 12 emissive triangles around the origin."""
    faces = []
    s = size / 2
    for c, u, v in [([0, -s, 0], [1, 0, 0], [0, 0, -1]),
                    ([0, s, 0], [1, 0, 0], [0, 0, 1]),
                    ([0, 0, -s], [1, 0, 0], [0, 1, 0]),
                    ([0, 0, s], [-1, 0, 0], [0, 1, 0]),
                    ([-s, 0, 0], [0, 0, 1], [0, 1, 0]),
                    ([s, 0, 0], [0, 0, -1], [0, 1, 0])]:
        faces.append(_quad(c, u, v, size))
    tris = np.concatenate(faces)
    emissive = np.full((len(tris), 3), L, np.float32)
    diffuse = np.zeros((len(tris), 3), np.float32)
    return tris, diffuse, emissive


@pytest.mark.parametrize('spec,rough,lo,hi', [
    (None, None, 0.97, 1.03),  # Lambertian furnace: exact energy balance
    (0.5, 0.6, 0.90, 1.02),    # principled: F0=0.04, mild roughness
    (1.0, 0.3, 0.90, 1.02),    # strongest F0, glossy
    (1.0, 0.6, 0.88, 1.02),    # rough: larger single-scattering loss
])
def test_furnace(spec, rough, lo, hi):
    """White furnace: an albedo-1 plate inside a uniformly emissive
    enclosure must read ~the wall radiance L.  The bound is asymmetric:
    the BSDF must never CREATE energy (hi ~1), while the
    single-scattering GGX + symmetric Fresnel coupling loses a few
    percent at higher roughness (documented limit; measured 3.6-6.6%
    across these cases)."""
    L = 2.0
    box_t, box_d, box_e = _emissive_box(L)
    plate = _quad([0, 0, 0], [1, 0, 0], [0, 1, 0], 1.0)
    tris = jnp.asarray(np.concatenate([box_t, plate]))
    n = tris.shape[0]
    diffuse = jnp.asarray(np.concatenate(
        [box_d, np.ones((2, 3), np.float32)]))
    emissive = jnp.asarray(np.concatenate(
        [box_e, np.zeros((2, 3), np.float32)]))
    kw = {}
    if spec is not None:
        kw = dict(specular=jnp.full((n,), spec, jnp.float32),
                  roughness=jnp.full((n,), rough, jnp.float32))
    img = np.asarray(path_trace(
        tris, _flat_vn(tris), jnp.ones(n, bool), diffuse, emissive,
        jnp.asarray(_look_at_z(2.0)), jnp.float32(np.deg2rad(20.0)),
        jax.random.key(5), resolution=8, spp=512, max_depth=4, **kw))
    center = img[3:5, 3:5].mean()
    assert lo * L <= center <= hi * L, (center, L, lo, hi)


@pytest.mark.slow
def test_specular_mis_matches_bruteforce():
    """Veach-style check: a glossy floor lit by a small bright light —
    the NEE+MIS estimator and the brute-force estimator agree in
    expectation WITH the GGX lobe on."""
    floor = _quad([0, 0, 0], [1, 0, 0], [0, 0, -1], 4.0)
    light = _quad([1.2, 2.0, 0], [1, 0, 0], [0, 0, 1], 0.25)
    tris = jnp.asarray(np.concatenate([floor, light]))
    n = tris.shape[0]
    diffuse = jnp.asarray([[0.2] * 3] * 2 + [[0.0] * 3] * 2, jnp.float32)
    emissive = jnp.asarray([[0.0] * 3] * 2 + [[300.0] * 3] * 2,
                           jnp.float32)
    spec = jnp.asarray([1.0] * 2 + [0.0] * 2, jnp.float32)
    rough = jnp.asarray([0.25] * 2 + [1.0] * 2, jnp.float32)
    # camera looking down at the floor at a grazing-ish angle
    R = np.stack([np.array([1, 0, 0]), np.array([0, 0, -1]),
                  np.array([0, 1, 0])], axis=1).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[1, 3] = 1.5
    args = (tris, _flat_vn(tris), jnp.ones(n, bool), diffuse, emissive,
            jnp.asarray(c2w), jnp.float32(np.deg2rad(60.0)))
    a = np.asarray(path_trace(*args, jax.random.key(6), resolution=8,
                              spp=512, max_depth=2, nee=True,
                              specular=spec, roughness=rough))
    b = np.asarray(path_trace(*args, jax.random.key(7), resolution=8,
                              spp=8192, max_depth=2, nee=False,
                              specular=spec, roughness=rough))
    np.testing.assert_allclose(a.mean(axis=(0, 1)), b.mean(axis=(0, 1)),
                               rtol=0.15)


def test_shading_normals_interpolated():
    """Tilted per-vertex normals change NEE direct lighting by exactly
    the analytic cosine ratio (cos(ns, wi) / cos(ng, wi))."""
    floor = _quad([0, 0, 0], [1, 0, 0], [0, 0, -1], 4.0)
    h, s = 2.0, 0.05
    light = _quad([0, h, 0], [1, 0, 0], [0, 0, 1], s)
    tris = jnp.asarray(np.concatenate([floor, light]))
    diffuse = jnp.asarray([[0.6] * 3] * 2 + [[0.0] * 3] * 2, jnp.float32)
    E = 500.0
    emissive = jnp.asarray([[0.0] * 3] * 2 + [[E] * 3] * 2, jnp.float32)
    # floor vn tilted 30 degrees toward +x; light keeps flat normals
    ang = np.deg2rad(30.0)
    tilted = np.array([np.sin(ang), np.cos(ang), 0.0], np.float32)
    vn = np.asarray(_flat_vn(tris)).copy()
    vn[0:2] = tilted
    R = np.stack([np.array([1, 0, 0]), np.array([0, 0, -1]),
                  np.array([0, 1, 0])], axis=1).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[1, 3] = 1.0
    img = np.asarray(path_trace(
        tris, jnp.asarray(vn), jnp.ones(4, bool), diffuse, emissive,
        jnp.asarray(c2w), jnp.float32(np.deg2rad(30.0)),
        jax.random.key(8), resolution=8, spp=128, max_depth=1))
    got = img[4, 4]
    # analytic with the tilted shading normal: cos_s = cos(30 deg)
    want = (np.asarray(diffuse[0]) / np.pi * E * (s * s) / (h * h)
            * np.cos(ang))
    np.testing.assert_allclose(got, want, rtol=0.08)
