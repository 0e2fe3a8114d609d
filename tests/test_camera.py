"""Unit tests for ray generation, camera transform, look-at, HDR codec."""

import numpy as np
import jax.numpy as jnp
import pytest

from renderformer_tpu.utils.hdr import hdr_decode_image, hdr_encode_texture
from renderformer_tpu.utils.look_at import look_at_to_c2w
from renderformer_tpu.utils.rays import generate_rays
from renderformer_tpu.utils.transform import trans_to_cam_coord

torch = pytest.importorskip('torch')


def _torch_ray_generator(c2w, fov, res):
    from conftest import import_reference
    import_reference()
    from renderformer.utils.ray_generator import RayGenerator
    gen = RayGenerator()
    return gen(torch.from_numpy(c2w), torch.from_numpy(fov), res)


def test_rays_match_torch_reference():
    rng = np.random.default_rng(0)
    for batch_shape in [(2,), (2, 3)]:
        c2w = rng.normal(size=batch_shape + (4, 4)).astype(np.float32)
        fov = (rng.uniform(0.4, 1.2, size=batch_shape + (1,))
               .astype(np.float32))
        to, td = _torch_ray_generator(c2w, fov, 32)
        jo, jd = generate_rays(jnp.asarray(c2w), jnp.asarray(fov), 32)
        np.testing.assert_allclose(np.asarray(jo), to.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(jd), td.numpy(), atol=1e-5)


def test_rays_identity_camera_closed_form():
    """Identity c2w: center ray looks down -Z (Blender convention)."""
    c2w = jnp.eye(4)[None]
    fov = jnp.array([[np.pi / 2]])
    res = 64
    o, d = generate_rays(c2w, fov, res)
    np.testing.assert_allclose(np.asarray(o[0]), [0, 0, 0])
    d = np.asarray(d[0])
    center = (d[res // 2 - 1, res // 2 - 1] + d[res // 2, res // 2]) / 2
    center /= np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 0, -1], atol=1e-2)
    # fov 90deg: corner x/|z| ~ tan(45deg) scaled by pixel center offset
    assert d[0, 0, 0] < 0 and d[0, 0, 1] > 0  # top-left: -x, +y
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)


def test_trans_to_cam_coord_rigid_inverse():
    rng = np.random.default_rng(1)
    # random rigid transform
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    t = rng.normal(size=3)
    c2w = np.eye(4)
    c2w[:3, :3] = R
    c2w[:3, 3] = t
    tris = rng.normal(size=(1, 5, 3, 3)).astype(np.float32)
    vns = rng.normal(size=(1, 5, 3, 3)).astype(np.float32)

    tris_cam, eye, vns_cam = trans_to_cam_coord(
        jnp.asarray(c2w[None], jnp.float32), jnp.asarray(tris), jnp.asarray(vns))

    want = np.einsum('ji,bnvj->bnvi', R, tris - t)  # R^T (x - t)
    np.testing.assert_allclose(np.asarray(tris_cam), want, atol=1e-5)
    want_n = np.einsum('ji,bnvj->bnvi', R, vns)
    np.testing.assert_allclose(np.asarray(vns_cam), want_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eye[0]), np.eye(4), atol=1e-6)

    # round trip: camera-space points of the camera origin = 0
    origin = jnp.asarray(t[None, None, None, :].repeat(3, axis=2),
                         jnp.float32)
    o_cam, _, _ = trans_to_cam_coord(
        jnp.asarray(c2w[None], jnp.float32), origin)
    np.testing.assert_allclose(np.asarray(o_cam), 0.0, atol=1e-5)


def test_look_at_properties():
    """c2w from look-at: column 3 = camera pos, -Z column points at target,
    rotation orthonormal, +Z-up convention respected."""
    rng = np.random.default_rng(2)
    for _ in range(5):
        pos = rng.normal(size=3) * 2
        target = rng.normal(size=3) * 0.2
        c2w = look_at_to_c2w(pos, target, [0, 0, 1])
        np.testing.assert_allclose(c2w[:3, 3], pos, atol=1e-8)
        np.testing.assert_allclose(c2w[3], [0, 0, 0, 1], atol=1e-12)
        R = c2w[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        # camera forward (+Z col of c2w in Blender convention) points away
        # from target: target - pos is along -Z_cam
        fwd = (pos - target) / np.linalg.norm(pos - target)
        np.testing.assert_allclose(R[:, 2], fwd, atol=1e-8)
        # right vector orthogonal to world up
        np.testing.assert_allclose(R[:, 0] @ np.array([0, 0, 1.0]), 0,
                                   atol=1e-8)


def test_look_at_reference_values():
    """Fixed numeric spot-check (values computed with the reference
    to_h5.look_at_to_c2w formula, scene_processor/to_h5.py:10-34)."""
    c2w = look_at_to_c2w([2.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
    # camera at +X looking at origin:
    # right = cross(up, fwd) = cross(+Z, +X) = +Y, up = +Z, fwd = +X
    np.testing.assert_allclose(c2w[:3, 3], [2, 0, 0], atol=1e-12)
    np.testing.assert_allclose(c2w[:3, 2], [1, 0, 0], atol=1e-12)  # fwd
    np.testing.assert_allclose(c2w[:3, 1], [0, 0, 1], atol=1e-12)  # up
    np.testing.assert_allclose(c2w[:3, 0], [0, 1, 0], atol=1e-12)  # right


def test_hdr_roundtrip():
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.uniform(0, 100, size=(1, 4, 13, 2, 2)),
                      jnp.float32)
    enc = hdr_encode_texture(tex)
    np.testing.assert_allclose(
        np.asarray(enc[:, :, :-3]), np.asarray(tex[:, :, :-3]))
    np.testing.assert_allclose(
        np.asarray(enc[:, :, -3:]),
        np.log10(np.asarray(tex[:, :, -3:]) + 1), rtol=1e-6)
    dec = hdr_decode_image(enc[:, :, -3:])
    np.testing.assert_allclose(
        np.asarray(dec), np.asarray(tex[:, :, -3:]), rtol=1e-4)
