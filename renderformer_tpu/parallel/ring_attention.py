"""Ring attention: sequence-parallel flash attention over the mesh's
``seq`` axis.

The GSPMD default for the stage-2 cross-attention (ray queries ×
triangle KV) under a seq-sharded layout is all-gather-KV: XLA gathers
the full triangle context onto every device (SURVEY.md §7.3 — the right
call at ≤8k triangles). Ring attention is the alternative for contexts
that do NOT fit (or whose gather would serialize against compute): KV
shards stay put and rotate around the ring via ``ppermute`` while each
device folds them into an online-softmax accumulator, so peak memory is
O(Sk / n_devices) and the permute of step i overlaps the compute of
step i-1 (XLA's latency-hiding scheduler handles the overlap; the
collective rides ICI).

Replaces nothing in the reference — it has no sequence parallelism at
all (SURVEY.md §2.8: DDP only; long sequences handled by flash-attn
varlen unpadding and a hard ~8k-triangle cap). This module removes that
cap for multi-chip deployments.

Design:
  * the public :func:`ring_attention` takes GLOBAL [B, S, H, D] arrays
    (traced under jit) and wraps its own ``shard_map`` over the active
    mesh, so call sites stay GSPMD-style;
  * forward: ``lax.scan`` of n steps; each step runs a *local* flash
    (or XLA) attention against the resident KV shard producing
    (out_i, lse_i), merges into a running (num, max, den) in fp32, and
    rotates (k, v, mask) one hop;
  * backward (ring-level ``custom_vjp``): a second ring pass with the
    flash backward kernels — dQ accumulates on the query's home device,
    dK/dV accumulate on the traveling KV shard and arrive home after n
    hops (rotation by n == identity);
  * RoPE is applied by the caller before the ring (a rotation belongs
    to its own token, so it travels with the shard for free);
  * both online-softmax merges use finite -1e30 sentinels so fully
    masked shards contribute exact zeros, never NaNs.

Numerics: per-step softmax statistics in fp32; the merged result is
invariant to shard order (up to fp32 rounding) and matches single-device
attention to ~1e-6 in fp32 (tested on an 8-device CPU mesh, fwd + grads).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Per-shard partial attention (forward + backward), XLA and flash backends
# ---------------------------------------------------------------------------

def _partial_fwd_xla(q, k, v, mask):
    """Local attention vs one KV shard. Returns (out [B,Sq,H,D] fp32,
    lse [B,Sq,H] fp32 natural-log, finite even when fully masked)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask[:, None, None, :] != 0, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum('bhqk,bkhd->bqhd', (p / l).astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    lse = (m + jnp.log(l))[..., 0]  # [B, H, Sq]
    return o.astype(jnp.float32), lse.transpose(0, 2, 1)


def _partial_bwd_xla(q, k, v, mask, out, lse, do):
    """Gradients of one KV shard's contribution, given the GLOBAL lse
    and out (delta = rowsum(do*out) uses the global normalization)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask[:, None, None, :] != 0, s, NEG_INF)
    p = jnp.exp(s - lse.transpose(0, 2, 1)[..., None])  # true probs
    do32 = do.astype(jnp.float32)
    dv = jnp.einsum('bhqk,bqhd->bkhd', p, do32)
    delta = jnp.sum(do32 * out.astype(jnp.float32), axis=-1)  # [B,Sq,H]
    dp = jnp.einsum('bqhd,bkhd->bhqk', do32, v.astype(jnp.float32))
    ds = p * (dp - delta.transpose(0, 2, 1)[..., None]) * scale
    dq = jnp.einsum('bhqk,bkhd->bqhd', ds, k.astype(jnp.float32))
    dk = jnp.einsum('bhqk,bqhd->bkhd', ds, q.astype(jnp.float32))
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _partial_fwd_flash(q, k, v, mask, interpret):
    from renderformer_tpu.ops.flash_attention import (
        LANES, _flash_fwd, _pick_bk, _round_up)
    b, sq, h, d = q.shape
    bq = min(512, _round_up(sq, 128))
    bk = _pick_bk(k.shape[1], None)
    out, lse = _flash_fwd(q, k, v, mask, bq, bk, interpret, with_lse=True)
    lse = lse.reshape(b, -1, h, LANES)[:, :sq, :, 0]  # [B, Sq, H]
    return out.astype(jnp.float32), jnp.maximum(lse, NEG_INF)


def _partial_bwd_flash(q, k, v, mask, out, lse, do, interpret):
    from renderformer_tpu.ops.flash_attention import (
        LANES, _flash_bwd, _pick_bk, _round_up)
    b, sq, h, d = q.shape
    bq = min(512, _round_up(sq, 128))
    bk = min(512, _pick_bk(k.shape[1], None))
    # rebuild the lane-replicated padded lse layout the kernels expect
    sq_p = _round_up(sq, bq)
    lse_k = jnp.broadcast_to(lse[..., None], (b, sq, h, LANES))
    if sq_p != sq:
        lse_k = jnp.pad(lse_k, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
    lse_k = lse_k.reshape(b, sq_p, h * LANES)
    return _flash_bwd(q, k, v, mask, out.astype(q.dtype), lse_k, do,
                      bq, bk, interpret)


# ---------------------------------------------------------------------------
# The ring (runs inside shard_map; q/k/v/mask are LOCAL shards)
# ---------------------------------------------------------------------------

def _merge(num, mx, den, o_i, lse_i):
    """Fold one partial (o_i, lse_i) into the running fp32 softmax state."""
    m_new = jnp.maximum(mx, lse_i)
    a = jnp.exp(mx - m_new)
    b = jnp.exp(lse_i - m_new)
    return (num * a[..., None] + o_i * b[..., None], m_new,
            den * a + b)


def _rotate(arrs, axis_name: str, n: int):
    perm = [(i, (i + 1) % n) for i in range(n)]
    return tuple(jax.lax.ppermute(a, axis_name, perm) for a in arrs)


def _ring_fwd_impl(q, k, v, mask, *, axis_name, n, impl, interpret):
    b, sq, h, d = q.shape

    def step(carry, _):
        k_c, v_c, m_c, num, mx, den = carry
        if impl == 'flash':
            o_i, lse_i = _partial_fwd_flash(q, k_c, v_c, m_c, interpret)
        else:
            o_i, lse_i = _partial_fwd_xla(q, k_c, v_c, m_c)
        num, mx, den = _merge(num, mx, den, o_i, lse_i)
        k_c, v_c, m_c = _rotate((k_c, v_c, m_c), axis_name, n)
        return (k_c, v_c, m_c, num, mx, den), None

    num0 = jnp.zeros((b, sq, h, d), jnp.float32)
    m0 = jnp.full((b, sq, h), NEG_INF, jnp.float32)
    den0 = jnp.zeros((b, sq, h), jnp.float32)
    (_, _, _, num, mx, den), _ = jax.lax.scan(
        step, (k, v, mask, num0, m0, den0), None, length=n)
    out = (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)
    lse = mx + jnp.log(jnp.maximum(den, 1e-30))  # global, [B, Sq, H]
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ring(q, k, v, mask, axis_name, n, impl, interpret):
    out, _ = _ring_fwd_impl(q, k, v, mask, axis_name=axis_name, n=n,
                            impl=impl, interpret=interpret)
    return out


def _ring_vjp_fwd(q, k, v, mask, axis_name, n, impl, interpret):
    out, lse = _ring_fwd_impl(q, k, v, mask, axis_name=axis_name, n=n,
                              impl=impl, interpret=interpret)
    return out, (q, k, v, mask, out, lse)


def _ring_vjp_bwd(axis_name, n, impl, interpret, res, g):
    q, k, v, mask, out, lse = res

    def step(carry, _):
        k_c, v_c, m_c, dk_c, dv_c, dq = carry
        if impl == 'flash':
            dq_i, dk_i, dv_i = _partial_bwd_flash(
                q, k_c, v_c, m_c, out, lse, g, interpret)
        else:
            dq_i, dk_i, dv_i = _partial_bwd_xla(q, k_c, v_c, m_c, out, lse, g)
        dq = dq + dq_i.astype(jnp.float32)
        dk_c = dk_c + dk_i.astype(jnp.float32)
        dv_c = dv_c + dv_i.astype(jnp.float32)
        # dk/dv travel WITH their kv shard; after n hops both are home
        k_c, v_c, m_c, dk_c, dv_c = _rotate(
            (k_c, v_c, m_c, dk_c, dv_c), axis_name, n)
        return (k_c, v_c, m_c, dk_c, dv_c, dq), None

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dq0 = jnp.zeros(q.shape, jnp.float32)
    (_, _, _, dk, dv, dq), _ = jax.lax.scan(
        step, (k, v, mask, dk0, dv0, dq0), None, length=n)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_ring.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def ring_attention(q, k, v, mask=None, *, mesh: Mesh,
                   seq_axis: str = 'seq', batch_axis: Optional[str] = 'data',
                   impl: str = 'xla', interpret: Optional[bool] = None):
    """Sequence-parallel attention over ``mesh[seq_axis]``.

    q: [B, Sq, H, D]; k/v: [B, Sk, H, D]; mask: [B, Sk] or
    [B, 1, 1, Sk] bool (True = attend) or None. Takes GLOBAL arrays
    under jit; shards Sq/Sk over ``seq_axis`` (and B over ``batch_axis``
    if given), runs the ring, returns the global [B, Sq, H, D] result.

    Requires Sq and Sk divisible by the ring size and B by the batch
    axis (the model pads sequences to static shapes already).
    """
    if mask is not None and mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    if mask is None:
        mask = jnp.ones(k.shape[:2], jnp.int32)
    mask = mask.astype(jnp.int32)
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'

    n = mesh.shape[seq_axis]
    if q.shape[1] % n or k.shape[1] % n:
        raise ValueError(
            f'ring_attention: Sq={q.shape[1]}, Sk={k.shape[1]} must divide '
            f'the ring size {n}')
    ba = batch_axis if batch_axis in mesh.shape else None
    qs = P(ba, seq_axis, None, None)
    ms = P(ba, seq_axis)

    fn = jax.shard_map(
        functools.partial(_ring, axis_name=seq_axis, n=n, impl=impl,
                          interpret=bool(interpret)),
        mesh=mesh,
        in_specs=(qs, qs, qs, ms),
        out_specs=qs,
        check_vma=False,
    )
    return fn(q, k, v, mask)
