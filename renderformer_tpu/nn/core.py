"""Functional NN primitives: dense layers and normalizations.

Parameters are plain nested-dict pytrees.  Kernel layout is ``[in, out]``
(JAX convention); the torch converter transposes ``[out, in]`` weights.

Numerics notes for parity with the reference:
  * torch ``nn.LayerNorm`` default eps is 1e-5; torch ``nn.RMSNorm`` with
    ``eps=None`` uses ``finfo(dtype).eps`` (1.1920929e-07 for fp32).  The
    attention-stack norms use an explicit eps of 1e-6
    (/root/reference/renderformer/layers/attention.py:16).
  * Norm statistics are computed in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# torch fp32 finfo eps — default eps of torch.nn.RMSNorm / F.rms_norm.
TORCH_DEFAULT_RMS_EPS = float(np.finfo(np.float32).eps)
# torch nn.LayerNorm default.
TORCH_DEFAULT_LN_EPS = 1e-5
# explicit eps used across the reference attention stack (attention.py:16).
ATTN_EPS = 1e-6


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """Kaiming-uniform init matching torch.nn.Linear defaults."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    params = {
        'kernel': jax.random.uniform(
            wkey, (in_dim, out_dim), dtype, minval=-bound, maxval=bound)
    }
    if bias:
        params['bias'] = jax.random.uniform(
            bkey, (out_dim,), dtype, minval=-bound, maxval=bound)
    return params


def dense(params, x, dtype=None):
    """x @ kernel (+ bias).

    Callers are responsible for params and x having the same dtype
    (see :func:`cast_params`): mixed bf16 activations x fp32 weights
    would silently promote the matmul to fp32 — 8x slower on the MXU."""
    kernel = params['kernel']
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    y = x @ kernel
    if 'bias' in params:
        y = y + params['bias'].astype(y.dtype)
    return y


def cast_params(params, dtype):
    """Cast a parameter tree to the compute dtype, keeping ``rope_freqs``
    fp32 (RoPE rotation is always computed in fp32 — precision policy).
    Gradients flow back to fp32 master weights through the cast (standard
    master-weight mixed precision)."""
    if dtype == jnp.float32:
        return params
    from jax.tree_util import tree_map_with_path

    def cast(path, p):
        if any(getattr(k, 'key', None) == 'rope_freqs' for k in path):
            return p
        if hasattr(p, 'dtype') and p.dtype == jnp.float32:
            return p.astype(dtype)
        return p

    return tree_map_with_path(cast, params)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def norm_init(norm_type: str, dim: int, dtype=jnp.float32):
    if norm_type == 'none':
        return {}
    params = {'scale': jnp.ones((dim,), dtype)}
    if norm_type == 'layer_norm':
        params['bias'] = jnp.zeros((dim,), dtype)
    return params


@functools.lru_cache(maxsize=1)
def _fused_norm_enabled() -> bool:
    """Pallas fused RMSNorm (ops/fused_norm.py), opt-in via
    RFTPU_FUSE_NORM=1. Measured on v5e at v1-base 512^2: standalone the
    kernel matches XLA (both ~2x the BW floor at [8,4096,768] bf16), and
    end-to-end it is 2.5% SLOWER (15.9 vs 16.3 M rays/s) — the kernel
    boundary blocks XLA from fusing the norm into neighboring consumers.
    Kept for models/shapes where XLA's norm fusion misbehaves (it did
    before the RoPE-fused attention landed: fp32 rotate-half
    materializations CSE'd with the norm upcasts at 1.7 ms apiece)."""
    import os
    if os.environ.get('RFTPU_FUSE_NORM', '0') == '0':
        return False
    return jax.devices()[0].platform == 'tpu'


def rms_norm(params, x, eps: float = TORCH_DEFAULT_RMS_EPS):
    """Statistics accumulate in fp32. On low-precision inputs the rescale
    multiply stays in x.dtype: if any fp32 use of x exists alongside the
    reduction, XLA CSEs the upcast and materializes an fp32 copy of the
    whole activation (measured ~0.85 ms per norm at [4,4096,768])."""
    if _fused_norm_enabled():
        from renderformer_tpu.ops.fused_norm import (
            fused_rms_norm, fused_rms_norm_supported)
        if fused_rms_norm_supported(x, params['scale']):
            return fused_rms_norm(x, params['scale'], eps)
    dtype = x.dtype
    ss = jnp.einsum('...d,...d->...', x, x,
                    preferred_element_type=jnp.float32)
    var = ss[..., None] / x.shape[-1]
    inv = jax.lax.rsqrt(var + eps)
    if dtype == jnp.float32:
        return x * inv * params['scale'].astype(jnp.float32)
    return x * inv.astype(dtype) * params['scale'].astype(dtype)


def layer_norm(params, x, eps: float = TORCH_DEFAULT_LN_EPS):
    dtype = x.dtype
    d = x.shape[-1]
    mean = (jnp.sum(x, axis=-1, keepdims=True, dtype=jnp.float32) / d)
    ss = jnp.einsum('...d,...d->...', x, x,
                    preferred_element_type=jnp.float32)
    var = ss[..., None] / d - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    if dtype == jnp.float32:
        return ((x - mean) * inv * params['scale'].astype(jnp.float32)
                + params['bias'].astype(jnp.float32))
    return ((x - mean.astype(dtype)) * inv.astype(dtype)
            * params['scale'].astype(dtype) + params['bias'].astype(dtype))


def apply_norm(norm_type: str, params, x, eps: Optional[float] = None):
    """Dispatch on norm type with per-site eps defaults matching torch."""
    if norm_type == 'none':
        return x
    if norm_type == 'rms_norm':
        return rms_norm(params, x, TORCH_DEFAULT_RMS_EPS if eps is None else eps)
    if norm_type == 'layer_norm':
        return layer_norm(params, x, TORCH_DEFAULT_LN_EPS if eps is None else eps)
    raise ValueError(f'Unsupported norm type: {norm_type}')


# ---------------------------------------------------------------------------
# Activations (parity with torch defaults)
# ---------------------------------------------------------------------------

def gelu(x):
    """Exact (erf) GeLU — torch F.gelu default."""
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


def elu(x, alpha: float = 1.0):
    """torch nn.ELU: x if x > 0 else alpha * (exp(x) - 1)."""
    safe = jnp.where(x > 0, 0.0, x)
    return jnp.where(x > 0, x, alpha * (jnp.exp(safe) - 1.0))


def residual_barrier(x):
    """Opt-in `optimization_barrier` on the residual stream after each
    join (``RFTPU_RESIDUAL_BARRIER=1``, read at trace time).

    Measured and REJECTED (round 3, v5e, v1-base 512^2 x8): the HEAD
    profile shows the FFN down-projections as `multiply_reduce_fusion`
    ops at 94 TF/s (the next norm's sum-of-squares reduction fused into
    the matmul's output fusion) vs 190 TF/s for the up-projection, and
    the hypothesis was that closing the fusion at the residual join
    frees the matmul. In-model A/B: 24.91/24.83 M rays/s without vs
    24.52/24.55 with the barrier — the one-pass fused epilogue beats
    matmul-then-re-read. Kept as an env toggle for future shapes."""
    import os
    if os.environ.get('RFTPU_RESIDUAL_BARRIER', '0') == '1':
        return jax.lax.optimization_barrier(x)
    return x


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def dropout(x, rate: float, rng):
    """Inverted dropout (torch nn.Dropout semantics: scale kept units by
    1/(1-p) at train time).  ``rng=None`` or ``rate<=0`` is the eval path —
    identity, no graph change."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), 0).astype(x.dtype)
