"""Pallas fused bilinear resize (ops/fused_resize.py) parity vs the XLA
gather+lerp path (interpret mode on CPU; the same kernel compiles on
TPU). Covers the DPT refinenet shapes (reference dpt.py:154-155,269-270),
forward exactness in fp32, bf16 rounding bounds, the transposed VJP, and
the support gate / fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderformer_tpu.nn.conv import resize_bilinear_align_corners
from renderformer_tpu.ops.fused_resize import (
    _axis_matrices,
    _interp_matrix,
    fused_resize,
    fused_resize_supported,
)


def _gather_ref(x, out_hw):
    """The pre-fusion gather path, independent of the dispatch flag."""
    from renderformer_tpu.nn.conv import _resize_axis
    out_h, out_w = out_hw
    if x.shape[1] != out_h:
        x = _resize_axis(x, 1, out_h)
    if x.shape[2] != out_w:
        x = _resize_axis(x, 2, out_w)
    return x


# The four refinenet upsamples of a 512² render plus a non-square case.
# The full-size 256² case is slow-tier (>20 s on 2 CPU cores).
CASES = [(32, 32, 64, 64, 128), (64, 64, 128, 128, 128),
         pytest.param(128, 128, 256, 256, 128, marks=pytest.mark.slow),
         (16, 32, 32, 64, 128)]


@pytest.mark.parametrize('ih,iw,oh,ow,c', CASES)
def test_forward_fp32_exact(ih, iw, oh, ow, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, ih, iw, c)), jnp.float32)
    assert fused_resize_supported(x, (oh, ow), interpret=True)
    want = _gather_ref(x, (oh, ow))
    got = fused_resize(x, (oh, ow), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)


def test_forward_bf16_bounded():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 128)), jnp.bfloat16)
    want = _gather_ref(x, (128, 128)).astype(jnp.float32)
    got = fused_resize(x, (128, 128), interpret=True).astype(jnp.float32)
    # both paths round to bf16; they differ only in rounding order
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=6e-2, rtol=2e-2)


@pytest.mark.parametrize('ih,iw,oh,ow,c', CASES[:2])
def test_grad_parity(ih, iw, oh, ow, c):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, ih, iw, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, oh, ow, c)), jnp.float32)

    def f_ref(z):
        return jnp.vdot(_gather_ref(z, (oh, ow)), g)

    def f_new(z):
        return jnp.vdot(fused_resize(z, (oh, ow), interpret=True), g)

    gr = jax.grad(f_ref)(x)
    gn = jax.grad(f_new)(x)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gr),
                               atol=1e-5, rtol=1e-5)


def test_adjoint_matrices():
    """The VJP matrices are exactly the transposed forward maps."""
    mh_f, mw_f = _axis_matrices(64, 64, 128, 128, False)
    mh_b, mw_b = _axis_matrices(128, 128, 64, 64, True)
    np.testing.assert_array_equal(mh_b, mh_f.T)
    np.testing.assert_array_equal(mw_b, mw_f.T)


def test_interp_matrix_rows_sum_to_one():
    for n_in, n_out in [(256, 512), (64, 64), (7, 19), (1, 8)]:
        m = _interp_matrix(n_in, n_out)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_support_gate():
    x = jnp.zeros((1, 32, 32, 96))  # c % 128 != 0
    assert not fused_resize_supported(x, (64, 64), interpret=True)
    x = jnp.zeros((1, 32, 32, 128, 1))  # wrong rank
    assert not fused_resize_supported(x, (64, 64), interpret=True)


def test_dispatch_fallback_unsupported_channels(monkeypatch):
    """resize_bilinear_align_corners must fall back to gathers when the
    kernel can't take the shape, independent of the flag."""
    monkeypatch.setenv('RFTPU_FUSE_RESIZE', '1')
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 96)), jnp.float32)
    want = _gather_ref(x, (32, 32))
    got = resize_bilinear_align_corners(x, (32, 32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# fused resize -> space-to-depth (the composed DPT tail input transform)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('ih,iw,oh,ow,c', [
    (64, 64, 128, 128, 128),
    pytest.param(128, 128, 256, 256, 128, marks=pytest.mark.slow),
    (16, 32, 32, 64, 128)])
def test_resize_s2d_forward_exact(ih, iw, oh, ow, c):
    from renderformer_tpu.ops.fused_resize import (
        fused_resize_s2d, fused_resize_s2d_supported)
    from renderformer_tpu.ops.s2d_conv import space_to_depth
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, ih, iw, c)), jnp.float32)
    assert fused_resize_s2d_supported(x, (oh, ow), interpret=True)
    want = space_to_depth(_gather_ref(x, (oh, ow)))
    got = fused_resize_s2d(x, (oh, ow), interpret=True)
    assert got.shape == (2, oh // 2, ow // 2, 4 * c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)


def test_resize_s2d_grad():
    from renderformer_tpu.ops.fused_resize import fused_resize_s2d
    from renderformer_tpu.ops.s2d_conv import space_to_depth
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 128)), jnp.float32)

    def loss_fused(x):
        return jnp.sum(fused_resize_s2d(x, (32, 32), interpret=True) ** 2)

    def loss_ref(x):
        return jnp.sum(space_to_depth(_gather_ref(x, (32, 32))) ** 2)

    g_fused = jax.grad(loss_fused)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
