"""HDR log-space codec (rendering_pipeline.py:66-68,121-123).

Emissive texture channels are log10(x+1)-encoded before the model and the
model output is pow(10, y) - 1 decoded, unless running in LDR mode.
"""

from __future__ import annotations

import jax.numpy as jnp


def hdr_encode_texture(texture: jnp.ndarray) -> jnp.ndarray:
    """log10(x+1) on the last 3 channels of axis 2 ([bs, N, C, ...])."""
    emissive = jnp.log10(texture[:, :, -3:] + 1.0)
    return jnp.concatenate([texture[:, :, :-3], emissive], axis=2)


def hdr_decode_image(img: jnp.ndarray) -> jnp.ndarray:
    """pow(10, y) - 1 on the rendered image."""
    return jnp.power(10.0, img) - 1.0
