"""Composed space-to-depth evaluation of the DPT output tail.

The tail (reference dpt.py:243-273) is, at the model's shapes, two
consecutive 3x3 convs with NO nonlinearity between them:

    out = conv1(p1)            # 3x3, C -> C/2   (output_conv1)
    out = resize(out)          # identity at patch_size 8 (512^2 -> 512^2)
    out = conv2a(out)          # 3x3, C/2 -> 32  (output_conv2[0])
    out = silu(out); out = conv2b(out)   # 1x1 -> 3

Composing conv1 and conv2a gives ONE 5x5 conv (C -> 32), and evaluating
that 5x5 conv in space-to-depth form costs only 36/25 of its taps
(vs 4x for a 3x3 — s2d amortizes better the larger the kernel) with a
full 4C contraction and 4*32 output lanes for the MXU:

    plain tail convs    : 386 GF at 41-75 TF/s  ~ 7.9 ms  (v5e, 512^2 x8)
    naive s2d (3x3 each): 1.55 TF at 194 TF/s   ~ 8.0 ms
    composed 5x5 s2d    : 618 GF at ~194 TF/s   ~ 3.2 ms

Exactness: the composition is exact except on the 1-pixel output ring —
conv2a sees ZEROS beyond conv1's output, while the composed conv
implicitly sees conv1 evaluated past the border (on zero-padded input).
``ring_correction`` computes that difference in closed form from the
four border rows/cols of the input (thin 1-D convs, ~0.1% of the FLOPs)
and subtracts it, restoring bit-for-bit semantics up to fp summation
order.  Parity: tests/test_dpt_tail.py.

Packing convention matches ops/s2d_conv.py:
    s2d(x)[i, j, (a*2+b)*C + c] = x[2i+a, 2j+b, c].
"""

from __future__ import annotations

import jax.numpy as jnp

from renderformer_tpu.ops.s2d_conv import depth_to_space, space_to_depth


def compose_conv3x3_pair(k1, b1, k2, b2):
    """(3x3 conv, bias b1) then (3x3 conv, bias b2) -> (5x5 conv, bias).

    k1: [3, 3, C, M]; k2: [3, 3, M, O].  Returns (k5 [5, 5, C, O], b5 [O]).
    Exact away from the 1px border ring (see ring_correction).
    """
    c, o = k1.shape[2], k2.shape[3]
    k5 = jnp.zeros((5, 5, c, o), jnp.result_type(k1, k2))
    for i1 in range(3):
        for j1 in range(3):
            for i2 in range(3):
                for j2 in range(3):
                    k5 = k5.at[i1 + i2, j1 + j2].add(k1[i1, j1] @ k2[i2, j2])
    b5 = b2 + jnp.einsum('m,ijmo->o', b1, k2)
    return k5, b5


def s2d_block_kernel5(k5):
    """[5, 5, C, O] -> [3, 3, 4C, 4O] space-to-depth block kernel.

    For output offset (a, b) and 5x5 tap (dy, dx) in {-2..2}:
        t = a + dy, s = b + dx in {-2..3};  in-block (t mod 2, s mod 2),
        block offset ((t - t%2)/2, (s - s%2)/2) in {-1, 0, 1}.
    Built by concatenation (not scatter) so XLA emits one fused pass.
    The block conv's 1-block (2px) zero padding exactly realizes the
    5x5 conv's 2px padding.
    """
    c, o = k5.shape[2], k5.shape[3]
    zero = jnp.zeros((c, o), k5.dtype)
    rows = []
    for u in (-1, 0, 1):
        cols = []
        for v in (-1, 0, 1):
            cblocks = []
            for ci in range(2):
                for cj in range(2):
                    oblocks = []
                    for a in range(2):
                        for b in range(2):
                            dy = 2 * u + ci - a
                            dx = 2 * v + cj - b
                            ok = -2 <= dy <= 2 and -2 <= dx <= 2
                            oblocks.append(k5[dy + 2, dx + 2] if ok else zero)
                    cblocks.append(jnp.concatenate(oblocks, axis=1))
            cols.append(jnp.concatenate(cblocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [3, 3, 4C, 4O]


def _conv1d_same(x, taps):
    """x [B, L, Cin], taps [3, Cin, Cout] -> [B, L, Cout], zero pad."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    L = x.shape[1]
    return sum(xp[:, k:k + L] @ taps[k].astype(x.dtype) for k in range(3))


def _conv1d_valid(x, taps):
    """x [B, L+2, Cin], taps [3, Cin, Cout] -> [B, L, Cout]."""
    L = x.shape[1] - 2
    return sum(x[:, k:k + L] @ taps[k].astype(x.dtype) for k in range(3))


def ring_correction(borders, k1, b1, k2):
    """Corrections to SUBTRACT from the composed conv's 1px output ring.

    borders: (top [B,W,C], bottom [B,W,C], left [B,H,C], right [B,H,C])
    — the four border rows/cols of the conv input u.
    Returns (c_top [B,W,O], c_bottom, c_left [B,H,O], c_right); corners
    are owned by the top/bottom strips (the left/right strips zero their
    corner entries, so the four updates compose additively).
    """
    u_t, u_b, u_l, u_r = borders
    dt = u_t.dtype
    bias = b1.astype(dt)

    # virtual conv1 outputs one step past each border (only one real
    # input row/col contributes through the opposite kernel row/col)
    v_top = _conv1d_same(u_t, k1[2]) + bias        # y1[-1, 0..W-1]
    v_bot = _conv1d_same(u_b, k1[0]) + bias        # y1[H, 0..W-1]
    v_lef = _conv1d_same(u_l, k1[:, 2]) + bias     # y1[0..H-1, -1]
    v_rig = _conv1d_same(u_r, k1[:, 0]) + bias     # y1[0..H-1, W]

    # corners: y1[-1,-1] etc. see exactly one input pixel
    c_tl = (u_t[:, :1] @ k1[2, 2].astype(dt)) + bias
    c_tr = (u_t[:, -1:] @ k1[2, 0].astype(dt)) + bias
    c_bl = (u_b[:, :1] @ k1[0, 2].astype(dt)) + bias
    c_br = (u_b[:, -1:] @ k1[0, 0].astype(dt)) + bias

    t_hat = jnp.concatenate([c_tl, v_top, c_tr], axis=1)   # [B, W+2, M]
    b_hat = jnp.concatenate([c_bl, v_bot, c_br], axis=1)
    zl = jnp.zeros_like(v_lef[:, :1])
    l_hat = jnp.concatenate([zl, v_lef, zl], axis=1)       # corners owned
    r_hat = jnp.concatenate([zl, v_rig, zl], axis=1)       # by top/bottom

    c_top = _conv1d_valid(t_hat, k2[0])       # ring row -1 -> out row 0
    c_bottom = _conv1d_valid(b_hat, k2[2])    # ring row H  -> out row H-1
    c_left = _conv1d_valid(l_hat, k2[:, 0])   # ring col -1 -> out col 0
    c_right = _conv1d_valid(r_hat, k2[:, 2])  # ring col W  -> out col W-1
    return c_top, c_bottom, c_left, c_right


def _apply_ring_s2d(z, corrections, o: int):
    """Subtract the ring corrections from ``z`` IN s2d layout.

    z: [B, H/2, W/2, 4O]; corrections from :func:`ring_correction`
    ([B, W, O] rows / [B, H, O] cols at full resolution).  Output pixel
    (y, x) lives at z[y//2, x//2, (y%2 * 2 + x%2) * O :].  Updating thin
    slices of the s2d tensor avoids materializing (and layout-copying)
    any full-resolution intermediate — the depth_to_space + 4x
    dynamic-update-slice formulation measured +3.2 ms/step of pure
    copies on v5e.
    """
    c_top, c_bottom, c_left, c_right = corrections
    dt = z.dtype
    b, h2, w2, _ = z.shape

    def eo(c):  # [B, L, O] -> even/odd positions
        return c[:, 0::2].astype(dt), c[:, 1::2].astype(dt)

    te, to = eo(c_top)        # output row 0    -> s2d row 0,  a=0
    be, bo = eo(c_bottom)     # output row H-1  -> s2d row -1, a=1
    le, lo = eo(c_left)       # output col 0    -> s2d col 0,  b=0
    re_, ro = eo(c_right)     # output col W-1  -> s2d col -1, b=1

    # Masked-broadcast formulation instead of 8 dynamic-update-slices:
    # each thin-slice DUS on the [B, H/2, W/2, 4O] tensor measured
    # ~0.42 ms of full-buffer copy on v5e (not aliased in place, strided
    # channel-range writes), ~1.4 ms/step total. Expressing the ring as
    # `z - select-by-position(broadcast small tensors)` stays lazy: XLA
    # fuses the compare+select+subtract into the activation pass that
    # already streams z, and the only materialized arrays are the four
    # [B, L/2, 4O] per-edge strips (corners get both contributions,
    # same as the DUS chain's sequential adds).
    zero_w = jnp.zeros_like(te)
    zero_h = jnp.zeros_like(le)
    top = jnp.concatenate([te, to, zero_w, zero_w], -1)     # [B, W/2, 4O]
    bot = jnp.concatenate([zero_w, zero_w, be, bo], -1)
    left = jnp.concatenate([le, zero_h, lo, zero_h], -1)    # [B, H/2, 4O]
    right = jnp.concatenate([zero_h, re_, zero_h, ro], -1)

    ii = jnp.arange(h2)[None, :, None, None]
    jj = jnp.arange(w2)[None, None, :, None]
    corr = (jnp.where(ii == 0, top[:, None], 0)
            + jnp.where(ii == h2 - 1, bot[:, None], 0)
            + jnp.where(jj == 0, left[:, :, None], 0)
            + jnp.where(jj == w2 - 1, right[:, :, None], 0))
    return z - corr


def _block_diag_1x1(kernel):
    """[1, 1, C, O] -> [1, 1, 4C, 4O] block-diagonal kernel (a 1x1 conv
    commutes with space-to-depth)."""
    _, _, c, o = kernel.shape
    zero = jnp.zeros((c, o), kernel.dtype)
    cols = []
    for i in range(4):
        blocks = [kernel[0, 0] if j == i else zero for j in range(4)]
        cols.append(jnp.concatenate(blocks, axis=0))
    return jnp.concatenate(cols, axis=1)[None, None]


def composed_tail(u, k1, b1, k2, b2, u_s2d=None):
    """conv2a(resize_id(conv1(u))) evaluated as one composed 5x5 s2d conv
    plus an exact 1px ring fix (applied in s2d layout).

    u: [B, H, W, C] (H, W even) — used for borders (and for the s2d
    transform when ``u_s2d`` is not given).  Returns [B, H, W, O].
    """
    from renderformer_tpu.nn.conv import conv2d
    o = k2.shape[3]
    k5, b5 = compose_conv3x3_pair(k1, b1, k2, b2)
    if u_s2d is None:
        u_s2d = space_to_depth(u)
    z = conv2d(u_s2d, s2d_block_kernel5(k5), jnp.tile(b5, 4), padding=1)

    borders = (u[:, 0], u[:, -1], u[:, :, 0], u[:, :, -1])
    z = _apply_ring_s2d(z, ring_correction(borders, k1, b1, k2), o)
    return depth_to_space(z)


def composed_tail_full(u, k1, b1, k2, b2, k3, b3, act,
                       u_s2d=None, borders=None):
    """The full DPT output tail — conv1, (identity resize), conv2a,
    activation, 1x1 conv2b — entirely in s2d layout: the only
    full-resolution tensor ever materialized is the final [B, H, W, out]
    image (out=3).  ``act`` is the elementwise activation (layout-
    invariant).

    ``u_s2d``/``borders`` let the caller supply the input already in s2d
    layout (e.g. from ops/fused_resize.fused_resize_s2d) together with
    the four border rows/cols of the full-resolution u — then u itself
    is never materialized; pass ``u=None``.
    Parity: tests/test_dpt_tail.py."""
    from renderformer_tpu.nn.conv import conv2d
    o = k2.shape[3]
    k5, b5 = compose_conv3x3_pair(k1, b1, k2, b2)
    if u_s2d is None:
        u_s2d = space_to_depth(u)
    if borders is None:
        borders = (u[:, 0], u[:, -1], u[:, :, 0], u[:, :, -1])
    z = conv2d(u_s2d, s2d_block_kernel5(k5), jnp.tile(b5, 4), padding=1)

    z = _apply_ring_s2d(z, ring_correction(borders, k1, b1, k2), o)
    z = act(z)
    z = conv2d(z, _block_diag_1x1(k3), jnp.tile(b3, 4))
    return depth_to_space(z)
