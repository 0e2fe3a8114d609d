"""Pallas TPU kernel for Swin window self-attention — batched 64-token
windows in native 128-row MXU tiles.

The one attention site still un-kerneled after round 3
(/root/reference/renderformer/layers/attention.py:354-359 runs SDPA
inside 8x8 windows): each window is 64 tokens, and routing it through
the generic flash kernel pads every window to a 128-row block — measured
SLOWER (2.23 vs 1.45 ms per 483M swin layer) than XLA's batched SDPA.

Design (VERDICT r3 next #2):
  * PAIR consecutive windows into 128-row blocks.  The residual stream is
    kept in window order (nn/attention.py seq_to_window_order), so windows
    are contiguous and the pairing is a free reshape
    [B*nW, 64, C] -> [B*nW/2, 128, C].  Scores for a pair are one full
    128x128 MXU tile; a block-diagonal additive bias (-1e30 off-diagonal)
    keeps the two windows independent.  Half the score FLOPs are masked
    padding, but the site is bandwidth/VPU-bound, not FLOP-bound — full
    tiles beat half-empty ones.
  * The shifted-window boolean mask folds into the SAME additive bias
    (one [nW/2, 128, 128] table per (H, W, ws, shift), precomputed in
    numpy and shared across views/heads through the index map).
  * Softmax runs in fp32 in the exp2 domain with the scale * log2(e)
    folded into q OUTSIDE the kernel (one fused XLA pass).
  * Grid (pair-blocks, heads) over the flat [BWp, 128, H*D] layout — the
    same no-physical-head-transpose trick as ops/flash_attention.py.
  * No online softmax: a window's whole key set (its pair block) is
    resident, so the softmax is one straight-line pass.

Backward: jax.custom_vjp with an analytic jnp backward (batched einsums
recomputing the scores flash-style).  Training throughput is dominated by
stage-1 anyway; the kernel's job is the inference hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


@functools.lru_cache(maxsize=32)
def _pair_bias_unshifted() -> np.ndarray:
    """[1, 128, 128] block-diagonal bias: 0 within each 64-token window,
    NEG_INF across the pair boundary."""
    bias = np.full((128, 128), NEG_INF, np.float32)
    bias[:64, :64] = 0.0
    bias[64:, 64:] = 0.0
    return bias[None]


@functools.lru_cache(maxsize=32)
def _pair_bias_shifted(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """[nW/2, 128, 128] bias: block-diagonal of consecutive windows'
    shifted-window bool masks (True=attend -> 0, else NEG_INF)."""
    from renderformer_tpu.nn.attention import swin_attn_mask
    mask = swin_attn_mask(h, w, ws, shift)  # [nW, s, s] bool
    nw, s, _ = mask.shape
    assert s == 64 and nw % 2 == 0, (nw, s)
    bias = np.full((nw // 2, 128, 128), NEG_INF, np.float32)
    bias[:, :64, :64] = np.where(mask[0::2], 0.0, NEG_INF)
    bias[:, 64:, 64:] = np.where(mask[1::2], 0.0, NEG_INF)
    return bias


def _swin_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One (pair-block, head) program.

    q/k/v blocks [P, 128, D] (q pre-scaled by softmax_scale*log2e),
    bias [P or 1, 128, 128] fp32, out [P, 128, D].
    """
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    # scores: [P, 128, 128] fp32 on the MXU (batch dim P)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[:]  # bias broadcasts over P when unshifted ([1,..])
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('pairs_per_block', 'interpret'))
def _swin_fwd(q, k, v, bias, pairs_per_block: int, interpret: bool):
    """q/k/v [BW, 64, C] flat window batches (BW even), bias
    [nbias, 128, 128] with nbias in {1, pairs_per_view}; C = H*D."""
    bw, s, c = q.shape
    bwp = bw // 2
    nbias = bias.shape[0]
    d = 128
    h = c // d
    p_blk = pairs_per_block
    scale = (1.0 / np.sqrt(d)) * LOG2E
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(bwp, 2 * s, c)
    kp = k.reshape(bwp, 2 * s, c)
    vp = v.reshape(bwp, 2 * s, c)

    grid = (bwp // p_blk, h)
    if nbias == 1:
        bias_spec = pl.BlockSpec((1, 2 * s, 2 * s), lambda i, hh: (0, 0, 0))
    else:
        # bias repeats per view: pair j uses bias[j % nbias]; blocks are
        # aligned (nbias % p_blk == 0 checked by the caller)
        nbb = nbias // p_blk
        bias_spec = pl.BlockSpec((p_blk, 2 * s, 2 * s),
                                 lambda i, hh: (i % nbb, 0, 0))
    qkv_spec = pl.BlockSpec((p_blk, 2 * s, d), lambda i, hh: (i, 0, hh))

    out = pl.pallas_call(
        _swin_kernel,
        out_shape=jax.ShapeDtypeStruct((bwp, 2 * s, c), q.dtype),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
    )(qs, kp, vp, bias)
    return out.reshape(bw, s, c)


def _ref_paired(q, k, v, bias):
    """jnp reference on the paired layout — the backward recompute path.
    q/k/v [BW, 64, C] (q UNscaled), bias [nbias, 128, 128]."""
    bw, s, c = q.shape
    bwp = bw // 2
    d = 128
    h = c // d
    scale = 1.0 / np.sqrt(d)
    qp = q.reshape(bwp, 2 * s, h, d)
    kp = k.reshape(bwp, 2 * s, h, d)
    vp = v.reshape(bwp, 2 * s, h, d)
    logits = jnp.einsum('pqhd,pkhd->phqk', qp, kp,
                        preferred_element_type=jnp.float32) * scale
    nbias = bias.shape[0]
    reps = bwp // nbias
    b_full = jnp.tile(bias, (reps, 1, 1)) if nbias > 1 else bias
    logits = logits + b_full[:, None] if nbias > 1 else logits + bias[None]
    probs = jax.nn.softmax(logits, axis=-1).astype(vp.dtype)
    out = jnp.einsum('phqk,pkhd->pqhd', probs, vp)
    return out.reshape(bw, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _swin_op(q, k, v, bias, pairs_per_block, interpret):
    return _swin_fwd(q, k, v, bias, pairs_per_block, interpret)


def _swin_op_fwd(q, k, v, bias, pairs_per_block, interpret):
    out = _swin_fwd(q, k, v, bias, pairs_per_block, interpret)
    return out, (q, k, v, bias)


def _swin_op_bwd(pairs_per_block, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _ref_paired(q_, k_, v_, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_swin_op.defvjp(_swin_op_fwd, _swin_op_bwd)


def swin_kernel_applicable(bw: int, s: int, c: int, num_heads: int,
                           n_windows: int) -> bool:
    """Static gate: 64-token windows, 128-dim heads, pairable windows
    that never straddle a view boundary, and a window batch large
    enough to feed the grid — at few windows (single-view training:
    bw=64 at 512^2) the small per-program grids plus the jnp-reference
    backward recompute measured a NET LOSS vs XLA's batched attention
    (483M 512^2 train step 254.3 vs 250.9 ms), while the 8-view
    inference batch (bw=512) gains ~8%.  bw >= 256 keeps the kernel on
    exactly where it wins."""
    return (s == 64 and c % num_heads == 0 and c // num_heads == 128
            and n_windows % 2 == 0 and bw % n_windows == 0
            and bw >= 256)


def _pick_pairs_per_block(bwp: int, nbias: int) -> int:
    for p in (8, 4, 2, 1):
        if bwp % p == 0 and (nbias == 1 or nbias % p == 0):
            return p
    return 1


def swin_window_attention(q, k, v, *, n_windows: int,
                          grid_hw=None, window_size: int = 8,
                          shift_size: int = 0, interpret=None):
    """Batched windowed attention on flat window batches.

    q/k/v: [B*nW, 64, C] (window-partitioned, heads packed in C with
    D=128).  ``n_windows`` = windows per view (nW).  For shifted layers
    pass grid_hw=(H, W) and shift_size>0 — the shifted-window mask is
    folded into the pair bias.  Returns [B*nW, 64, C].
    """
    bw, s, c = q.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    if shift_size > 0:
        h, w = grid_hw
        bias_np = _pair_bias_shifted(h, w, window_size, shift_size)
    else:
        bias_np = _pair_bias_unshifted()
    bias = jnp.asarray(bias_np)
    pairs = _pick_pairs_per_block(bw // 2, bias.shape[0])
    return _swin_op(q, k, v, bias, pairs, interpret)
