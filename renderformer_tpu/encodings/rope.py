"""Triangle rotary position embedding (9-coordinate RoPE).

Parity with the reference (/root/reference/renderformer/encodings/rope.py):
  * per-head-dim frequencies ``2 ** linspace(0, log2(dim/2 - 1), dim/2)``
    (``log2(dim - 1)`` when double_max_freq) — rope.py:171-176;
  * the 9 triangle coordinates (3 vertices x xyz) are outer-multiplied with
    the frequency vector and laid out HF-style "concat halves" —
    rope.py:188-199;
  * ``freqs_to_cos_sin`` keeps the first half of the angles, zero-pads them
    into ``head_dim//2`` slots (zero angle == identity rotation on the
    leftover dims) and duplicates — rope.py:78-103;
  * rotation is always applied in fp32 — rope.py:106-149.

All functions are pure; cos/sin tables are computed once per forward and
shared across layers (attention.py:579-590).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def rope_frequencies(dim: int, double_max_freq: bool = False) -> np.ndarray:
    """Log-spaced base frequencies, shape [dim//2], fp32."""
    max_freq = math.log2(dim - 1) if double_max_freq else math.log2(dim // 2 - 1)
    return (2.0 ** np.linspace(0.0, max_freq, dim // 2)).astype(np.float32)


def triangle_freqs(pos: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Outer-product positions with base frequencies, HF layout.

    pos:   [B, N, 9]  (3 vertices x xyz; fp32)
    freqs: [dim//2]
    returns angles [B, N, 1, 9 * dim//2 * 2]  (HF concat-halves layout;
    the singleton is the head-broadcast slot of the [B, S, H, D] layout)
    """
    pos = pos.astype(jnp.float32)
    ang = pos[..., None] * freqs  # [B, N, 9, dim//2]
    b, n = ang.shape[0], ang.shape[1]
    ang = ang.reshape(b, n, 1, -1)  # head-dim broadcast slot
    return jnp.concatenate([ang, ang], axis=-1)


def freqs_to_cos_sin(
    freqs: jnp.ndarray, head_dim: int, scale: float = 1.0, start_index: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-pad angles to head_dim and take cos/sin (rope.py:78-103).

    freqs: [..., n_angles] with n_angles even (HF duplicated layout).
    returns (cos, sin) each [..., head_dim], fp32.
    """
    half = freqs[..., : freqs.shape[-1] // 2]
    left = start_index
    right = head_dim // 2 - (left + half.shape[-1])
    if right < 0:
        raise ValueError(
            f'rope angles ({half.shape[-1]}) exceed head_dim//2 ({head_dim // 2})')
    pad = [(0, 0)] * (freqs.ndim - 1) + [(left, right)]
    half = jnp.pad(half, pad)
    full = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(full) * scale, jnp.sin(full) * scale


def _rotate_half_hf(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` [B, S, H, head_dim] by cos/sin [B, S, 1, head_dim].

    Always computes in fp32 and casts back (rope.py:106,131).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    out = x32 * cos + _rotate_half_hf(x32) * sin
    return out.astype(dtype)


def make_cos_sin(
    pos: jnp.ndarray, rope_dim: int, head_dim: int, double_max_freq: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience: positions [B, N, 9] -> (cos, sin) [B, N, 1, head_dim]."""
    base = jnp.asarray(rope_frequencies(rope_dim, double_max_freq))
    ang = triangle_freqs(pos, base)
    return freqs_to_cos_sin(ang, head_dim=head_dim)
