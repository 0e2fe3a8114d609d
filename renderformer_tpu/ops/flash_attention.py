"""Pallas TPU flash attention with key-padding masks.

TPU-native replacement for the reference's CUDA flash-attn varlen path
(/root/reference/renderformer/layers/attention.py:162-198): instead of
unpadding variable-length sequences (dynamic shapes), we keep static
shapes and fold the boolean key-padding mask into the online-softmax
(SURVEY.md §7.3 "varlen -> static-shape masking").

Serves both attention patterns of the model:
  * stage-1 self-attention  : q,k,v [B, H, S, D], mask [B, S]
  * stage-2 cross-attention : q [B, H, Sq, D], k/v [B, H, Sk, D], mask [B, Sk]

Forward is a single Pallas kernel (grid = B x H x Sq-blocks; K/V resident
in VMEM, online softmax over K blocks in fp32).  Backward recomputes
attention with the XLA reference path via ``jax.custom_vjp`` — a proper
Pallas backward kernel is tracked for a later milestone.
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


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, bk: int, scale: float):
    """One (batch, head, q-block) grid step.

    q_ref: [bq, D]; k_ref/v_ref: [Sk, D]; mask_ref: [B, Sk] (int32,
    1=attend, full array resident — TPU block tiling disallows squeezed
    1-D mask blocks); o_ref: [bq, D].
    """
    bq, d = q_ref.shape
    sk = k_ref.shape[0]
    nkb = sk // bk
    bi = pl.program_id(0)

    q = q_ref[:].astype(jnp.float32) * scale

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * bk, bk), :]
        v = v_ref[pl.ds(kb * bk, bk), :]
        mask = mask_ref[bi, pl.ds(kb * bk, bk)]

        logits = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=('bq', 'bk', 'interpret'))
def _flash_fwd(q, k, v, mask, bq: int, bk: int, interpret: bool):
    b, h, sq, d = q.shape
    sk = k.shape[2]

    sq_p = _round_up(sq, bq)
    sk_p = _round_up(sk, bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))

    scale = 1.0 / np.sqrt(d)
    grid = (b, h, sq_p // bq)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bk=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, bq, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, sk_p, d),
                         lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, sk_p, d),
                         lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, sk_p), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, bq, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)

    if sq_p != sq:
        out = out[:, :, :sq, :]
    return out


def _xla_reference(q, k, v, mask):
    """Reference attention used for the backward pass (recompute)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum('bhqk,bhkd->bhqd', probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, mask, bq, bk, interpret):
    return _flash_fwd(q, k, v, mask, bq, bk, interpret)


def _flash_vjp_fwd(q, k, v, mask, bq, bk, interpret):
    return _flash_fwd(q, k, v, mask, bq, bk, interpret), (q, k, v, mask)


def _flash_vjp_bwd(bq, bk, interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, mask),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q, k, v, mask=None,
                    bq: int = 512, bk: int = 512,
                    interpret: Optional[bool] = None):
    """Masked flash attention.

    q: [B, H, Sq, D]; k/v: [B, H, Sk, D]
    mask: broadcastable key mask; accepts [B, Sk] or [B, 1, 1, Sk] bool
          (True = attend), or None.
    """
    if mask is not None and mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    sq, sk = q.shape[2], k.shape[2]
    bq = min(bq, _round_up(sq, 128))
    bk = min(bk, _round_up(sk, 128))
    return _flash(q, k, v, mask, bq, bk, interpret)
