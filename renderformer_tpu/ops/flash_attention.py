"""Pallas TPU flash attention with key-padding masks — forward + backward.

TPU-native replacement for the reference's CUDA flash-attn varlen path
(/root/reference/renderformer/layers/attention.py:162-198): instead of
unpadding variable-length sequences (dynamic shapes), we keep static
shapes and fold the boolean key-padding mask into the online softmax
(SURVEY.md §7.3 "varlen -> static-shape masking").

Serves both attention patterns of the model:
  * stage-1 self-attention  : q,k,v [B, S, H, D], mask [B, S]
  * stage-2 cross-attention : q [B, Sq, H, D], k/v [B, Sk, H, D], mask [B, Sk]

The sequence-major [B, S, H, D] layout matches what the fused qkv
projections produce, so no physical head transposes are materialized
(they showed up as ~7 ms/step of pure copies in device profiles).
Internally arrays are viewed as [B, S, H*D] (a free reshape) and blocks
address per-head [*, D] slices through the index map — TPU block tiling
rejects squeezed head axes in the last two block dims.

Kernels:
  * forward — grid (B, H, Sq-blocks), K/V resident in VMEM, online
    softmax over K blocks in fp32; optionally emits the logsumexp in the
    lane-replicated [B, H, Sq, 128] layout (TPU block-tiling friendly).
  * backward — two kernels recomputing attention flash-style:
      dQ  : grid (B, H, Sq-blocks), loop over K blocks
      dKV : grid (B, H, Sk-blocks), loop over Q blocks
    with delta = rowsum(dO * O) precomputed in XLA (it fuses).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref=None, *,
                bk: int, scale: float, with_lse: bool):
    """One (batch, head, q-block) grid step.

    q_ref: [bq, D]; k_ref/v_ref: [Sk, D]; mask_ref: [B, Sk] (int32,
    1=attend, full array resident — TPU block tiling disallows squeezed
    1-D mask blocks); o_ref: [bq, D]; lse_ref: [bq, LANES] or None.
    """
    bq, d = q_ref.shape
    sk = k_ref.shape[0]
    nkb = sk // bk
    bi = pl.program_id(0)

    # keep QK^T in the input dtype (bf16 on TPU -> full MXU rate) with
    # fp32 accumulation; scale applied to the fp32 logits
    q = q_ref[:]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * bk, bk), :]
        v = v_ref[pl.ds(kb * bk, bk), :]
        mask = mask_ref[bi, pl.ds(kb * bk, bk)]

        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        logits = jnp.where(mask[None, :] != 0, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)  # [bq, bk]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nkb, body, (acc, m0, l0))

    o_ref[:] = (acc / l).astype(o_ref.dtype)
    if with_lse:
        lse = m + jnp.log(l)
        lse_ref[:] = jnp.broadcast_to(lse, (bq, LANES))


@functools.partial(jax.jit,
                   static_argnames=('bq', 'bk', 'interpret', 'with_lse'))
def _flash_fwd(q, k, v, mask, bq: int, bk: int, interpret: bool,
               with_lse: bool = False):
    b, sq, h, d = q.shape
    sk = k.shape[1]

    sq_p = _round_up(sq, bq)
    sk_p = _round_up(sk, bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))

    scale = 1.0 / np.sqrt(d)
    grid = (b, h, sq_p // bq)

    # free reshapes: [B, S, H, D] -> [B, S, H*D]; blocks pick the per-head
    # [*, D] slice via the index map's head coordinate
    q2 = q.reshape(b, sq_p, h * d)
    k2 = k.reshape(b, sk_p, h * d)
    v2 = v.reshape(b, sk_p, h * d)

    out_shape = [jax.ShapeDtypeStruct((b, sq_p, h * d), q.dtype)]
    out_specs = [pl.BlockSpec((None, bq, d),
                              lambda bi, hi, qi: (bi, qi, hi),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b, sq_p, h * LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((None, bq, LANES),
                                      lambda bi, hi, qi: (bi, qi, hi),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_fwd_kernel, bk=bk, scale=scale, with_lse=with_lse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d),
                         lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, sk_p, d),
                         lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, sk_p, d),
                         lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, sk_p), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shape if with_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        interpret=interpret,
    )(q2, k2, v2, mask)

    if with_lse:
        out, lse = res
    else:
        out, lse = res, None
    out = out.reshape(b, sq_p, h, d)
    if sq_p != sq:
        out = out[:, :sq, :, :]
    return (out, lse) if with_lse else out


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   mask_ref, dq_ref, *, bk: int, scale: float):
    """dQ for one (batch, head, q-block): loop over K blocks.

    q/do: [bq, D]; k/v: [Sk, D]; lse/delta: [bq, LANES]; mask: [B, Sk].
    dS = P * (dO V^T - delta); dQ = scale * dS K.
    """
    bq, d = q_ref.shape
    sk = k_ref.shape[0]
    bi = pl.program_id(0)
    dt = q_ref.dtype

    q = q_ref[:]
    do = do_ref[:]
    lse = lse_ref[:, 0:1]
    delta = delta_ref[:, 0:1]

    def body(kb, dq_acc):
        k = k_ref[pl.ds(kb * bk, bk), :]
        v = v_ref[pl.ds(kb * bk, bk), :]
        mask = mask_ref[bi, pl.ds(kb * bk, bk)]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        p = jnp.where(mask[None, :] != 0, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        ds = ((dp - delta) * p * scale).astype(dt)
        return dq_acc + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, sk // bk, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    mask_ref, dk_ref, dv_ref, *, bq: int, scale: float):
    """dK/dV for one (batch, head, k-block): loop over Q blocks.

    k/v: [bk, D]; q/do: [Sq, D]; lse/delta: [Sq, LANES]; mask: [B, Sk].
    dV = P^T dO; dK = scale * dS^T Q.
    """
    bk_, d = k_ref.shape
    sq = q_ref.shape[0]
    bi = pl.program_id(0)
    ki = pl.program_id(2)
    dt = q_ref.dtype

    k = k_ref[:]
    v = v_ref[:]
    mask = mask_ref[bi, pl.ds(ki * bk_, bk_)]

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[pl.ds(qb * bq, bq), :]
        do = do_ref[pl.ds(qb * bq, bq), :]
        lse = lse_ref[pl.ds(qb * bq, bq), 0:1]
        delta = delta_ref[pl.ds(qb * bq, bq), 0:1]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]
        p = jnp.exp(s - lse)
        p = jnp.where(mask[None, :] != 0, p, 0.0)

        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(dt), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, D]

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        ds = ((dp - delta) * p * scale).astype(dt)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, D]
        return dk_acc, dv_acc

    dk, dv = jax.lax.fori_loop(
        0, sq // bq, body,
        (jnp.zeros((bk_, d), jnp.float32), jnp.zeros((bk_, d), jnp.float32)))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bq', 'bk', 'interpret'))
def _flash_bwd(q, k, v, mask, out, lse, do, bq: int, bk: int,
               interpret: bool):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    sq_p = _round_up(sq, bq)
    sk_p = _round_up(sk, bk)

    if sq_p != sq:
        pad = ((0, 0), (0, sq_p - sq), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        do = jnp.pad(do, pad)
        out = jnp.pad(out, pad)
    if sk_p != sk:
        pad = ((0, 0), (0, sk_p - sk), (0, 0), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))
    # lse comes already padded from the forward, [B, sq_p, H*LANES]

    scale = 1.0 / np.sqrt(d)
    # delta = rowsum(dO * O) in the same folded lane-replicated layout
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # [B, sq_p, H]
    delta = jnp.broadcast_to(
        delta[..., None], (b, sq_p, h, LANES)).reshape(b, sq_p, h * LANES)

    q2 = q.reshape(b, sq_p, h * d)
    k2 = k.reshape(b, sk_p, h * d)
    v2 = v.reshape(b, sk_p, h * d)
    do2 = do.reshape(b, sq_p, h * d)
    common_in = [q2, k2, v2, do2, lse, delta, mask]

    def qspec(block_sq):
        return pl.BlockSpec((None, block_sq, d),
                            lambda bi, hi, i: (bi, i, hi),
                            memory_space=pltpu.VMEM)

    def full_qspec():
        return pl.BlockSpec((None, sq_p, d),
                            lambda bi, hi, i: (bi, 0, hi),
                            memory_space=pltpu.VMEM)

    def full_kspec():
        return pl.BlockSpec((None, sk_p, d),
                            lambda bi, hi, i: (bi, 0, hi),
                            memory_space=pltpu.VMEM)

    def lm_spec_block():
        return pl.BlockSpec((None, bq, LANES),
                            lambda bi, hi, i: (bi, i, hi),
                            memory_space=pltpu.VMEM)

    def lm_spec_full():
        return pl.BlockSpec((None, sq_p, LANES),
                            lambda bi, hi, i: (bi, 0, hi),
                            memory_space=pltpu.VMEM)

    mask_spec = pl.BlockSpec((b, sk_p), lambda bi, hi, i: (0, 0),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, bk=bk, scale=scale),
        grid=(b, h, sq_p // bq),
        in_specs=[qspec(bq), full_kspec(), full_kspec(), qspec(bq),
                  lm_spec_block(), lm_spec_block(), mask_spec],
        out_specs=qspec(bq),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        interpret=interpret,
    )(*common_in)

    kv_spec = pl.BlockSpec((None, bk, d),
                           lambda bi, hi, i: (bi, i, hi),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, bq=bq, scale=scale),
        grid=(b, h, sk_p // bk),
        in_specs=[full_qspec(), kv_spec, kv_spec, full_qspec(),
                  lm_spec_full(), lm_spec_full(), mask_spec],
        out_specs=(kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((b, sk_p, h * d), k.dtype),
                   jax.ShapeDtypeStruct((b, sk_p, h * d), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        interpret=interpret,
    )(*common_in)

    dq = dq.reshape(b, sq_p, h, d)
    dk = dk.reshape(b, sk_p, h, d)
    dv = dv.reshape(b, sk_p, h, d)
    if sq_p != sq:
        dq = dq[:, :sq, :, :]
    if sk_p != sk:
        dk = dk[:, :sk, :, :]
        dv = dv[:, :sk, :, :]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, mask, bq, bk, interpret):
    return _flash_fwd(q, k, v, mask, bq, bk, interpret)


def _flash_vjp_fwd(q, k, v, mask, bq, bk, interpret):
    out, lse = _flash_fwd(q, k, v, mask, bq, bk, interpret, with_lse=True)
    return out, (q, k, v, mask, out, lse)


def _flash_vjp_bwd(bq, bk, interpret, res, g):
    q, k, v, mask, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, mask, out, lse, g, bq, bk, interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q, k, v, mask=None,
                    bq: int = 512, bk: int = 512,
                    interpret: Optional[bool] = None):
    """Masked flash attention.

    q: [B, Sq, H, D]; k/v: [B, Sk, H, D]
    mask: broadcastable key mask; accepts [B, Sk] or [B, 1, 1, Sk] bool
          (True = attend), or None.
    """
    if mask is not None and mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[1]), dtype=bool)
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    sq, sk = q.shape[1], k.shape[1]
    bq = min(bq, _round_up(sq, 128))
    bk = min(bk, _round_up(sk, 128))
    return _flash(q, k, v, mask, bq, bk, interpret)


# ---------------------------------------------------------------------------
# RoPE-fused forward (opt-in via RFTPU_FUSE_ROPE=1)
#
# Rotates q and k in fp32 inside the kernel prologue instead of
# materializing rotated copies through HBM (the XLA rotate-half fusions
# cost ~3 ms / 4 views in device profiles). The rotation is orthogonal,
# so the backward pass rotates the primals forward again (recompute) and
# inverse-rotates dq/dk with negated sin.
# ---------------------------------------------------------------------------

def _rot(x32, cos, sin):
    """HF rotate-half applied in fp32: x*cos + rotate_half(x)*sin."""
    half = x32.shape[-1] // 2
    rot = jnp.concatenate([-x32[:, half:], x32[:, :half]], axis=-1)
    return x32 * cos + rot * sin


def _fwd_rope_kernel(q_ref, k_ref, v_ref, mask_ref, cosq_ref, sinq_ref,
                     cosk_ref, sink_ref, o_ref, lse_ref=None, *,
                     bk: int, scale: float, with_lse: bool):
    """Like _fwd_kernel, with fp32 RoPE fused into the prologue.

    cosq/sinq: [bq, D] fp32; cosk/sink: [Sk, D] fp32 (head-shared).
    """
    bq, d = q_ref.shape
    sk = k_ref.shape[0]
    nkb = sk // bk
    bi = pl.program_id(0)
    dt = q_ref.dtype

    q = _rot(q_ref[:].astype(jnp.float32),
             cosq_ref[:], sinq_ref[:]).astype(dt)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = _rot(k_ref[pl.ds(kb * bk, bk), :].astype(jnp.float32),
                 cosk_ref[pl.ds(kb * bk, bk), :],
                 sink_ref[pl.ds(kb * bk, bk), :]).astype(dt)
        v = v_ref[pl.ds(kb * bk, bk), :]
        mask = mask_ref[bi, pl.ds(kb * bk, bk)]

        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask[None, :] != 0, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nkb, body, (acc, m0, l0))

    o_ref[:] = (acc / l).astype(o_ref.dtype)
    if with_lse:
        lse_ref[:] = jnp.broadcast_to(m + jnp.log(l), (bq, LANES))


@functools.partial(jax.jit,
                   static_argnames=('bq', 'bk', 'interpret', 'with_lse'))
def _flash_fwd_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                    bq: int, bk: int, interpret: bool,
                    with_lse: bool = False):
    """cos/sin: [B, S, D] fp32, shared across heads."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    sq_p = _round_up(sq, bq)
    sk_p = _round_up(sk, bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
        cosq = jnp.pad(cosq, ((0, 0), (0, sq_p - sq), (0, 0)))
        sinq = jnp.pad(sinq, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        cosk = jnp.pad(cosk, ((0, 0), (0, sk_p - sk), (0, 0)))
        sink = jnp.pad(sink, ((0, 0), (0, sk_p - sk), (0, 0)))
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))

    scale = 1.0 / np.sqrt(d)
    grid = (b, h, sq_p // bq)

    q2 = q.reshape(b, sq_p, h * d)
    k2 = k.reshape(b, sk_p, h * d)
    v2 = v.reshape(b, sk_p, h * d)

    def fold_spec(block_s):
        return pl.BlockSpec((None, block_s, d),
                            lambda bi, hi, qi: (bi, qi, hi),
                            memory_space=pltpu.VMEM)

    def fold_full_k():
        return pl.BlockSpec((None, sk_p, d),
                            lambda bi, hi, qi: (bi, 0, hi),
                            memory_space=pltpu.VMEM)

    def rope_q_spec():
        return pl.BlockSpec((None, bq, d),
                            lambda bi, hi, qi: (bi, qi, 0),
                            memory_space=pltpu.VMEM)

    def rope_k_spec():
        return pl.BlockSpec((None, sk_p, d),
                            lambda bi, hi, qi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((b, sq_p, h * d), q.dtype)]
    out_specs = [fold_spec(bq)]
    if with_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b, sq_p, h * LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((None, bq, LANES),
                                      lambda bi, hi, qi: (bi, qi, hi),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_fwd_rope_kernel, bk=bk, scale=scale,
                          with_lse=with_lse),
        grid=grid,
        in_specs=[fold_spec(bq), fold_full_k(), fold_full_k(),
                  pl.BlockSpec((b, sk_p), lambda bi, hi, qi: (0, 0),
                               memory_space=pltpu.VMEM),
                  rope_q_spec(), rope_q_spec(),
                  rope_k_spec(), rope_k_spec()],
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shape if with_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        interpret=interpret,
    )(q2, k2, v2, mask, cosq, sinq, cosk, sink)

    if with_lse:
        out, lse = res
    else:
        out, lse = res, None
    out = out.reshape(b, sq_p, h, d)
    if sq_p != sq:
        out = out[:, :sq, :, :]
    return (out, lse) if with_lse else out


def _rot_bhsd(x, cos, sin):
    """apply_rope on [B, S, H, D] with head-shared [B, S, D] tables."""
    x32 = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x32[..., half:], x32[..., :half]], axis=-1)
    return (x32 * cos[:, :, None, :] + rot * sin[:, :, None, :]).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _flash_rope(q, k, v, mask, cosq, sinq, cosk, sink, bq, bk, interpret):
    return _flash_fwd_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                           bq, bk, interpret)


def _flash_rope_vjp_fwd(q, k, v, mask, cosq, sinq, cosk, sink,
                        bq, bk, interpret):
    out, lse = _flash_fwd_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                               bq, bk, interpret, with_lse=True)
    return out, (q, k, v, mask, cosq, sinq, cosk, sink, out, lse)


def _flash_rope_vjp_bwd(bq, bk, interpret, res, g):
    q, k, v, mask, cosq, sinq, cosk, sink, out, lse = res
    # recompute rotated primals, run the standard backward, then rotate
    # dq/dk back (orthogonal rotation: inverse == negated sin)
    q_rot = _rot_bhsd(q, cosq, sinq)
    k_rot = _rot_bhsd(k, cosk, sink)
    dq_rot, dk_rot, dv = _flash_bwd(q_rot, k_rot, v, mask, out, lse, g,
                                    bq, bk, interpret)
    dq = _rot_bhsd(dq_rot, cosq, -sinq)
    dk = _rot_bhsd(dk_rot, cosk, -sink)
    zq = jnp.zeros_like(cosq)
    zk = jnp.zeros_like(cosk)
    return dq, dk, dv, None, zq, zq, zk, zk


_flash_rope.defvjp(_flash_rope_vjp_fwd, _flash_rope_vjp_bwd)


def flash_attention_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                         bq: int = 512, bk: int = 512,
                         interpret=None):
    """Flash attention with fp32 RoPE fused into the kernel prologue.

    q/k/v: [B, S, H, D]; cos/sin: [B, S, 1, D] or [B, S, D] fp32
    (head-shared); mask: [B, Sk] or [B, 1, 1, Sk] bool, True = attend.
    """
    if mask is not None and mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[1]), dtype=bool)
    if cosq.ndim == 4:
        cosq, sinq = cosq[:, :, 0, :], sinq[:, :, 0, :]
    if cosk.ndim == 4:
        cosk, sink = cosk[:, :, 0, :], sink[:, :, 0, :]
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    sq, sk = q.shape[1], k.shape[1]
    bq = min(bq, _round_up(sq, 128))
    bk = min(bk, _round_up(sk, 128))
    # stop-gradient on the tables: positions are no-grad in the reference
    cosq = jax.lax.stop_gradient(cosq.astype(jnp.float32))
    sinq = jax.lax.stop_gradient(sinq.astype(jnp.float32))
    cosk = jax.lax.stop_gradient(cosk.astype(jnp.float32))
    sink = jax.lax.stop_gradient(sink.astype(jnp.float32))
    return _flash_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                       bq, bk, interpret)
