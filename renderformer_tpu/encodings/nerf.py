"""Multi-scale sinusoidal (NeRF) positional encoding.

Behavioral parity with the reference
(/root/reference/renderformer/encodings/nerf_encoding.py:25-84):
frequencies are ``2 ** linspace(min_freq_exp, max_freq_exp, num)``; the
encoded output is ``sin(concat([x*f, x*f + pi/2]))`` over the flattened
(input-dim, frequency) axis, with the raw input optionally prepended.

Pure function — frequencies are baked at trace time as constants.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def nerf_out_dim(in_dim: int, num_frequencies: int, include_input: bool = False) -> int:
    out = in_dim * num_frequencies * 2
    if include_input:
        out += in_dim
    return out


def nerf_encode(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float = 0.0,
    max_freq_exp: Optional[float] = None,
    include_input: bool = False,
) -> jnp.ndarray:
    """Encode the last axis of ``x``.

    [*, D] -> [*, D*num_frequencies*2 (+ D)]
    Layout: [x?, sin(x0 f0), sin(x0 f1), ..., sin(x_{D-1} f_{F-1}),
             cos(x0 f0), ...] — matching torch's interleave-then-concat.
    """
    if max_freq_exp is None:
        max_freq_exp = num_frequencies - 1

    if num_frequencies == 0:
        # torch.linspace(min, max, 0) is empty; output reduces to the input
        # (if included) — the vdir_num_freqs=0 default path.
        return x if include_input else x[..., :0]

    freqs = jnp.asarray(
        2.0 ** np.linspace(min_freq_exp, max_freq_exp, num_frequencies),
        dtype=x.dtype,
    )
    scaled = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    encoded = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
    if include_input:
        encoded = jnp.concatenate([x, encoded], axis=-1)
    return encoded
