"""Swin window attention unit tests (SURVEY.md §4 item 1): partition /
reverse inverse, shifted-window mask vs a naive reimplementation, and
module equivalence to full attention in the no-shift small-window case."""

import numpy as np
import jax
import jax.numpy as jnp

from renderformer_tpu.nn.attention import (
    SwinSelfAttention, swin_attn_mask, window_partition, window_reverse)


def test_window_partition_reverse_inverse():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)), jnp.float32)
    for ws in (4, 8):
        w = window_partition(x, ws)
        assert w.shape == (2 * (16 // ws) * (24 // ws), ws * ws, 5)
        back = window_reverse(w, ws, 16, 24)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def _naive_swin_mask(h, w, window_size, shift_size):
    """Literal re-statement of the reference algorithm
    (attention.py:238-271) with explicit python loops."""
    img = np.zeros((h, w), dtype=int)
    cnt = 0
    for hs in [slice(0, h - window_size),
               slice(h - window_size, h - shift_size),
               slice(h - shift_size, h)]:
        for ws_ in [slice(0, w - window_size),
                    slice(w - window_size, w - shift_size),
                    slice(w - shift_size, w)]:
            img[hs, ws_] = cnt
            cnt += 1
    n_wh, n_ww = h // window_size, w // window_size
    windows = np.zeros((n_wh * n_ww, window_size * window_size), dtype=int)
    for wi in range(n_wh):
        for wj in range(n_ww):
            block = img[wi * window_size:(wi + 1) * window_size,
                        wj * window_size:(wj + 1) * window_size]
            windows[wi * n_ww + wj] = block.reshape(-1)
    nw, s = windows.shape
    mask = np.zeros((nw, s, s), dtype=bool)
    for k in range(nw):
        for i in range(s):
            for j in range(s):
                mask[k, i, j] = windows[k, i] == windows[k, j]
    return mask


def test_swin_mask_matches_naive():
    for h, w, ws, ss in [(16, 16, 8, 4), (32, 32, 8, 4), (16, 24, 4, 2)]:
        got = swin_attn_mask(h, w, ws, ss)
        want = _naive_swin_mask(h, w, ws, ss)
        np.testing.assert_array_equal(got, want)


def test_swin_no_shift_equals_full_attention_within_window():
    """window covering the whole image + no shift == plain attention."""
    rng = np.random.default_rng(1)
    dim, heads = 16, 2
    swin = SwinSelfAttention(dim=dim, num_heads=heads, window_size=8,
                             shift_size=0, bias=False)
    params = swin.init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(1, 8, 8, dim)), jnp.float32)
    out = swin(params, x)

    # reference computation: full attention over the 64 tokens
    from renderformer_tpu.nn.core import dense
    from renderformer_tpu.nn.attention import sdpa_xla
    tok = x.reshape(1, 64, dim)
    q, k, v = jnp.split(dense(params['in_proj'], tok), 3, axis=-1)
    q = q.reshape(1, 64, heads, dim // heads)
    k = k.reshape(1, 64, heads, dim // heads)
    v = v.reshape(1, 64, heads, dim // heads)
    attn = sdpa_xla(q, k, v).reshape(1, 64, dim)
    want = dense(params['out_proj'], attn).reshape(1, 8, 8, dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_swin_shift_changes_output_but_preserves_shape():
    rng = np.random.default_rng(2)
    dim = 8
    m0 = SwinSelfAttention(dim=dim, num_heads=2, window_size=4, shift_size=0)
    m1 = SwinSelfAttention(dim=dim, num_heads=2, window_size=4, shift_size=2)
    params = m0.init(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(1, 8, 8, dim)), jnp.float32)
    y0 = m0(params, x)
    y1 = m1(params, x)
    assert y0.shape == y1.shape == x.shape
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-4


def test_window_ordered_path_matches_legacy():
    """SwinSelfAttention on a window-ordered [B, S, C] stream (the
    decoder's layout) == the row-major [B, H, W, C] path, for both
    shifted and unshifted layers."""
    from renderformer_tpu.nn.attention import window_order_indices

    rng = np.random.default_rng(3)
    b, h, w, c, heads, ws = 2, 16, 24, 12, 2, 4
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    for shift in (0, 2):
        mod = SwinSelfAttention(dim=c, num_heads=heads, window_size=ws,
                                shift_size=shift, qk_norm=True)
        params = mod.init(jax.random.key(0))
        ref = mod(params, x)  # [B, H, W, C]

        wo = np.asarray(window_order_indices(h, w, ws))
        xs = x.reshape(b, h * w, c)[:, wo]
        got = mod(params, xs, grid=(h, w))  # [B, S, C] window-ordered
        got_rm = np.asarray(got)[:, np.argsort(wo)].reshape(b, h, w, c)
        np.testing.assert_allclose(got_rm, np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_shifted_regroup_matches_gather():
    """Structured slice/roll/concat regroup == the index-permutation
    definition (partition(roll(x, -s)) on a window-ordered stream)."""
    from renderformer_tpu.nn.attention import (
        seq_from_window_order, seq_to_window_order, shifted_regroup,
        window_order_indices)

    rng = np.random.default_rng(7)
    b, h, w, c, ws, s = 2, 24, 16, 5, 4, 2
    x = jnp.asarray(rng.normal(size=(b, h * w, c)), jnp.float32)
    xw = seq_to_window_order(x, h, w, ws)

    # reference permutation: window order -> row-major -> roll -> window
    base = np.asarray(window_order_indices(h, w, ws))
    rolled = np.roll(np.roll(np.arange(h * w).reshape(h, w), -s, axis=0),
                     -s, axis=1).reshape(-1)
    fwd = np.argsort(base)[rolled[base]]
    want = np.asarray(xw)[:, fwd]

    got = shifted_regroup(xw, h, w, ws, s)
    np.testing.assert_array_equal(np.asarray(got), want)
    back = shifted_regroup(got, h, w, ws, s, inverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xw))
    np.testing.assert_array_equal(
        np.asarray(seq_from_window_order(xw, h, w, ws)), np.asarray(x))
