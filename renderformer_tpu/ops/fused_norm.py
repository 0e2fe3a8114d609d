"""Pallas TPU fused RMSNorm — forward + backward.

TPU-native replacement for the reference's Liger-Kernel Triton RMSNorm
monkey-patch (/root/reference/infer.py:47-51, requirements.txt:13 — see
SURVEY.md §2.9). Opt-in via RFTPU_FUSE_NORM=1; measurements on v5e at
the model's hot shape [8·4096, 768] bf16:

  * standalone, the kernel and XLA's two-pass norm both run at ~0.24 ms
    (~2x the read+write BW floor), across row blocks 128..4096;
  * end-to-end at v1-base 512^2 the kernel is 2.5% SLOWER (15.9 vs
    16.3 M rays/s): the pallas_call boundary stops XLA fusing the norm
    into neighboring consumers (residual adds, matmul operand prep).

Historical context: before the RoPE-fused flash attention landed, the
qk-norm sites cost 1.7 ms apiece — the norms' fp32 upcasts were CSE'd
with the RoPE rotate-half fp32 materializations, forcing whole-activation
fp32 HBM copies. That pathology is gone; XLA's norm fusion is now clean,
so this kernel stays opt-in for shapes/models where fusion regresses.

Design:
  * rows are independent -> 1-D grid over row blocks, fully parallel;
  * statistics (sum of squares) accumulate in fp32 regardless of input
    dtype; the rescale multiply matches the XLA path's op order exactly
    (x * inv.astype(dtype) * scale.astype(dtype)) so golden tests see
    bit-identical outputs between backends;
  * backward recomputes the row statistic from the saved input (one
    extra VPU reduction on data the kernel already reads — cheaper than
    storing [R, 1] fp32 residuals in a lane-replicated layout):
        dx = inv * (g*s) - x * inv^3/D * sum(g*s*x)
        ds = sum_rows(g * x * inv)
    with per-block ds partials written to a [n_blocks, D] fp32 output
    and reduced by one XLA sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_rows(r: int) -> int:
    """Largest power-of-two row block <= 1024 dividing r (0 if r needs
    padding — fewer than 8 rows' worth of 2-adic divisibility)."""
    for b in (1024, 512, 256, 128, 64, 32, 16, 8):
        if r % b == 0:
            return b
    return 0


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, s_ref, o_ref, *, eps: float):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    ms = jnp.sum(xf * xf, axis=1, keepdims=True) / x.shape[1]
    inv = jax.lax.rsqrt(ms + eps)
    if x.dtype == jnp.float32:
        o_ref[:] = x * inv * s_ref[:]
    else:
        o_ref[:] = x * inv.astype(x.dtype) * s_ref[:].astype(x.dtype)


def _bwd_kernel(x_ref, s_ref, g_ref, dx_ref, ds_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)  # [1, D]
    d = xf.shape[1]
    ms = jnp.sum(xf * xf, axis=1, keepdims=True) / d
    inv = jax.lax.rsqrt(ms + eps)
    gs = g * s
    dot = jnp.sum(gs * xf, axis=1, keepdims=True)
    dx = gs * inv - xf * (inv * inv * inv * (dot / d))
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # TPU tiling wants >=8 sublanes per block: replicate the [1, D]
    # partial over 8 rows; the reducer reads row 0 of each block.
    part = jnp.sum(g * (xf * inv), axis=0, keepdims=True)
    ds_ref[:] = jnp.broadcast_to(part, (8, d))


# ---------------------------------------------------------------------------
# 2-D wrappers ([R, D] after the public reshape)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def _fwd2d(x, scale, eps: float, interpret: bool):
    r, d = x.shape
    br = _pick_rows(r)
    rp = r
    if br == 0:
        rp = _round_up(r, 256)
        x = jnp.pad(x, ((0, rp - r), (0, 0)))
        br = 256
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(rp // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(x, scale.reshape(1, d).astype(jnp.float32))
    return out[:r] if rp != r else out


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def _bwd2d(x, scale, g, eps: float, interpret: bool):
    r, d = x.shape
    br = _pick_rows(r)
    rp = r
    if br == 0:
        rp = _round_up(r, 256)
        # zero rows contribute rsqrt(eps)-scaled zeros -> zero partials
        x = jnp.pad(x, ((0, rp - r), (0, 0)))
        g = jnp.pad(g, ((0, rp - r), (0, 0)))
        br = 256
    nb = rp // br
    dx, ds_part = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, d), x.dtype),
            jax.ShapeDtypeStruct((nb * 8, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(x, scale.reshape(1, d).astype(jnp.float32), g)
    ds = jnp.sum(ds_part.reshape(nb, 8, d)[:, 0, :], axis=0)
    return (dx[:r] if rp != r else dx), ds


# ---------------------------------------------------------------------------
# custom_vjp + public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused(x2, scale, eps, interpret):
    return _fwd2d(x2, scale, eps, interpret)


def _fused_vjp_fwd(x2, scale, eps, interpret):
    return _fwd2d(x2, scale, eps, interpret), (x2, scale)


def _fused_vjp_bwd(eps, interpret, res, g):
    x2, scale = res
    dx, ds = _bwd2d(x2, scale, g, eps, interpret)
    return dx, ds.astype(scale.dtype)


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_rms_norm(x, scale, eps: float, interpret=None):
    """RMSNorm over the last axis in one fused Pallas pass.

    x: [..., D] (D a multiple of 128); scale: [D].  Matches
    :func:`renderformer_tpu.nn.core.rms_norm` numerics exactly
    (fp32 statistics, rescale in x.dtype).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    d = x.shape[-1]
    lead = x.shape[:-1]
    out = _fused(x.reshape(-1, d), scale, float(eps), bool(interpret))
    return out.reshape(*lead, d)


def fused_rms_norm_supported(x, scale) -> bool:
    """Shape gate: 2-D+ input, lane-aligned D, enough rows to win."""
    if x.ndim < 2 or scale.ndim != 1 or x.shape[-1] != scale.shape[0]:
        return False
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return d % 128 == 0 and rows >= 256
