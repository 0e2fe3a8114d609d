"""Unit tests for NeRF PE and triangle RoPE — closed-form and vs torch."""

import numpy as np
import jax.numpy as jnp
import pytest

from renderformer_tpu.encodings.nerf import nerf_encode, nerf_out_dim
from renderformer_tpu.encodings.rope import (
    apply_rope, freqs_to_cos_sin, make_cos_sin, rope_frequencies,
    triangle_freqs,
)

torch = pytest.importorskip('torch')


def test_nerf_out_dim():
    assert nerf_out_dim(9, 6, include_input=True) == 9 * 6 * 2 + 9  # 117
    assert nerf_out_dim(3, 0, include_input=True) == 3


def test_nerf_encode_closed_form():
    x = jnp.array([[0.25, -0.5]])
    enc = np.asarray(nerf_encode(x, num_frequencies=2, include_input=True))
    # freqs = [1, 2]; layout [x, sin(x0*1), sin(x0*2), sin(x1*1), sin(x1*2),
    #                         cos(...) in same order]
    expect = np.array([
        0.25, -0.5,
        np.sin(0.25), np.sin(0.5), np.sin(-0.5), np.sin(-1.0),
        np.cos(0.25), np.cos(0.5), np.cos(-0.5), np.cos(-1.0),
    ], dtype=np.float32)
    np.testing.assert_allclose(enc[0], expect, atol=1e-6)


def test_nerf_encode_zero_freqs_identity():
    x = jnp.array([[1.0, 2.0, 3.0]])
    enc = nerf_encode(x, num_frequencies=0, include_input=True)
    np.testing.assert_array_equal(np.asarray(enc), np.asarray(x))


def test_nerf_matches_torch_reference():
    from conftest import import_reference
    import_reference()
    from renderformer.encodings.nerf_encoding import NeRFEncoding

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 9)).astype(np.float32)
    ref = NeRFEncoding(in_dim=9, num_frequencies=6, include_input=True)
    want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(nerf_encode(jnp.asarray(x), 6, include_input=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rope_frequencies():
    f = rope_frequencies(12)
    assert f.shape == (6,)
    np.testing.assert_allclose(f[0], 1.0)
    np.testing.assert_allclose(f[-1], 5.0, rtol=1e-6)  # 2^log2(5)


def test_rope_identity_on_padded_dims():
    """Zero-angle padding must leave the tail dims of q unchanged."""
    pos = jnp.zeros((1, 3, 9))
    cos, sin = make_cos_sin(pos, rope_dim=12, head_dim=128)
    # [B, S, H, D] sequence-major layout
    q = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 2, 128)),
                    dtype=jnp.float32)
    out = apply_rope(q, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-6)


def test_rope_matches_torch_reference():
    from conftest import import_reference
    import_reference()
    from renderformer.encodings.rope import (
        TriangleRotaryEmbedding, freqs_to_cos_sin as t_f2cs,
        apply_rotary_emb_cossin)

    rng = np.random.default_rng(2)
    pos = rng.normal(size=(2, 7, 9)).astype(np.float32) * 0.5
    head_dim = 128
    emb = TriangleRotaryEmbedding(dim=12)
    tf = emb.get_triangle_freqs(torch.from_numpy(pos))
    tcos, tsin = t_f2cs(tf, head_dim=head_dim)

    base = jnp.asarray(rope_frequencies(12))
    jf = triangle_freqs(jnp.asarray(pos), base)
    jcos, jsin = freqs_to_cos_sin(jf, head_dim=head_dim)
    # ours is [B, N, 1, D]; torch reference is [B, 1, N, D]
    np.testing.assert_allclose(
        np.asarray(jcos).transpose(0, 2, 1, 3), tcos.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jsin).transpose(0, 2, 1, 3), tsin.numpy(), atol=1e-6)

    # torch applies in [B, H, S, D]; ours in [B, S, H, D]
    q = rng.normal(size=(2, 4, 7, head_dim)).astype(np.float32)
    k = rng.normal(size=(2, 4, 7, head_dim)).astype(np.float32)
    tq, tk = apply_rotary_emb_cossin(
        torch.from_numpy(q), torch.from_numpy(k), tcos, tsin)
    jq = apply_rope(jnp.asarray(q.transpose(0, 2, 1, 3)), jcos, jsin)
    jk = apply_rope(jnp.asarray(k.transpose(0, 2, 1, 3)), jcos, jsin)
    np.testing.assert_allclose(
        np.asarray(jq).transpose(0, 2, 1, 3), tq.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jk).transpose(0, 2, 1, 3), tk.numpy(), atol=1e-5)
