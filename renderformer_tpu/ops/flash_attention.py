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

VPU-economy design (the softmax bookkeeping, not the matmuls, is the
utilization ceiling at D=128): the softmax scale and log2(e) are folded
into q before the K loop (for the RoPE-fused kernel: into the q-side
cos/sin tables — the rotation is linear, so scaling the tables scales
the rotated q for free), the exponentials run as native exp2, the
key-padding mask is an additive [bk] bias instead of a [bq, bk] select,
and unmasked call sites (ray-token self-attention) compile a kernel with
no mask work at all. Backward defers its scale multiply from the
[bq, bk] dS block to the [*, D] epilogue.

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
LOG2E = 1.4426950408889634  # log2(e): softmax runs in the exp2 domain
LN2 = 0.6931471805599453

# backward loop-block clamps (v5e-tuned; tools/attn_bwd_micro.py sweeps
# these — module constants so experiments retrace instead of aliasing the
# jit cache)
BWD_MAX_BQ = 512
BWD_MAX_BK = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_q_split(bq: int, bk: int, sk: int, h: int = 0) -> int:
    """Independent q sub-chains per forward block in the single-K-block
    path (see _fwd_body). Read ONCE per call in the public wrappers and
    threaded through as a static argument so it participates in the jit
    cache key — in-process sweeps that flip the env var retrace instead
    of silently reusing the previously compiled kernel.

    Default 4 on the single-K-block path: the straight-line
    S -> softmax -> PV chain serializes MXU and VPU; four independent
    sub-chains let Mosaic overlap one chain's softmax with another's
    matmuls. Measured on v5e (tools/cross_micro.py, post cache-key fix):
    ray-self 4096^2 B8 2.94 -> 2.21 ms (71% -> 95% of the matmul ideal,
    with bq=1024), cross 4096x2064 masked 1.95 -> 1.68 ms. The earlier
    'flat' split sweep was invalidated by the ADVICE round-2 #1 stale
    jit-cache bug."""
    import os
    env = os.environ.get('RFTPU_FWD_SPLIT')
    if env is not None:
        return int(env)
    single_block = _round_up(sk, 128) <= bk
    if not single_block:
        return 1
    # round-5 H=8 sweep (tools/cross_micro.py): at the 483M cross shape
    # (4096x2064, H=8) split=8 with bq=1024 measures 2.258 vs 2.509 ms
    # for the old 512/4 default; at H=6 (v1-base) split=8 REGRESSES
    # (1.61 vs 1.531 at 1024/4) — 8 chains of 128 rows suit 8-aligned
    # head grids only.
    # chains shorter than 128 rows regress (bq=512/split=8 measured
    # 2.593 vs 2.281 at split=2): require bq/8 >= 128
    if h and h % 8 == 0 and bq % 8 == 0 and bq // 8 >= 128:
        return 8
    return 4 if (bq % 4 == 0 and bq // 4 >= 8) else 1


def _pick_bk(sk: int, bk: Optional[int]) -> int:
    """Default K-block policy: one block covering the whole K sequence
    whenever it fits VMEM (collapses the online softmax to a single
    straight-line pass — measured 82% vs 53% MXU util at 4096 keys on
    v5e); stream 2048-key blocks beyond that."""
    if bk is not None:
        return min(bk, _round_up(sk, 128))
    skp = _round_up(sk, 128)
    return skp if skp <= 4096 else 2048


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_body(q, k_ref, v_ref, mask_ref, bi, nkb, bk, split=1):
    """Online softmax over K blocks, exp2 domain.

    `q` comes pre-scaled by softmax_scale * log2(e), so the loop body is
    two matmuls plus: [optional +bias], max, exp2, sum, acc rescale.
    Returns (acc fp32 [bq, D], m2 [bq,1], l [bq,1]) with m2 in log2 units.

    When the whole K sequence is a single block (the default whenever it
    fits VMEM — see ``_pick_bk``) the online rescale bookkeeping
    degenerates to one straight-line softmax pass, the fastest variant
    measured on v5e (82% vs 53% MXU util at 4096x4096).
    """
    bq, d = q.shape

    def block_logits(kb):
        k = k_ref[pl.ds(kb * bk, bk), :]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk], log2 units
        if mask_ref is not None:
            mask = mask_ref[bi, pl.ds(kb * bk, bk)]
            bias = jnp.where(mask != 0, 0.0, NEG_INF)  # [bk]
            logits = logits + bias[None, :]
        return logits

    if nkb == 1:
        def chain(qc):
            logits = jax.lax.dot_general(
                qc, k_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mask_ref is not None:
                mask = mask_ref[bi, :]
                logits = logits + jnp.where(mask != 0, 0.0, NEG_INF)[None, :]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp2(logits - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, m, l
        # split the q rows into independent chains: the straight-line
        # S -> softmax -> PV chain serializes MXU and VPU; independent
        # sub-chains let Mosaic's scheduler overlap one half's softmax
        # (VPU) with the other half's matmuls (MXU).
        ns = split
        if ns > 1 and bq % ns == 0 and bq // ns >= 8:
            parts = [chain(q[i * (bq // ns):(i + 1) * (bq // ns)])
                     for i in range(ns)]
            return tuple(jnp.concatenate(t, axis=0) for t in zip(*parts))
        return chain(q)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        v = v_ref[pl.ds(kb * bk, bk), :]
        logits = block_logits(kb)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(logits - m_new)  # [bq, bk] — == exp(s*scale - m)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    return jax.lax.fori_loop(0, nkb, body, (acc, m0, l0))


def _fwd_epilogue(acc, m2, l, o_ref, lse_ref, with_lse):
    bq = acc.shape[0]
    o_ref[:] = (acc / l).astype(o_ref.dtype)
    if with_lse:
        # natural-log lse (what the backward expects): m2 and l are in
        # the exp2 domain, so lse = ln2 * m2 + ln(l)
        lse = m2 * LN2 + jnp.log(l)
        lse_ref[:] = jnp.broadcast_to(lse, (bq, LANES))


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref=None, *,
                bk: int, scale: float, with_lse: bool, split: int = 1):
    """One (batch, head, q-block) grid step, masked variant.

    q_ref: [bq, D]; k_ref/v_ref: [Sk, D]; mask_ref: [B, Sk] (int32,
    1=attend, full array resident — TPU block tiling disallows squeezed
    1-D mask blocks); o_ref: [bq, D]; lse_ref: [bq, LANES] or None.
    """
    sk = k_ref.shape[0]
    bi = pl.program_id(0)
    q = (q_ref[:].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    acc, m2, l = _fwd_body(q, k_ref, v_ref, mask_ref, bi, sk // bk, bk, split)
    _fwd_epilogue(acc, m2, l, o_ref, lse_ref, with_lse)


def _fwd_kernel_nomask(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                       bk: int, scale: float, with_lse: bool,
                       split: int = 1):
    """Unmasked variant — no mask ref, no bias pass (ray self-attention)."""
    sk = k_ref.shape[0]
    q = (q_ref[:].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    acc, m2, l = _fwd_body(q, k_ref, v_ref, None, 0, sk // bk, bk, split)
    _fwd_epilogue(acc, m2, l, o_ref, lse_ref, with_lse)


@functools.partial(jax.jit,
                   static_argnames=('bq', 'bk', 'interpret', 'with_lse',
                                    'split'))
def _flash_fwd(q, k, v, mask, bq: int, bk: int, interpret: bool,
               with_lse: bool = False, split: int = 1):
    b, sq, h, d = q.shape
    sk = k.shape[1]

    sq_p = _round_up(sq, bq)
    sk_p = _round_up(sk, bk)
    # flatten FIRST ([B, S, H, D] -> [B, S, H*D] is a free view of the
    # projection output), then pad on the flat shape: keeping every
    # producer's root on the flat layout lets XLA fold the custom-call
    # layout normalization into the pad/rotate fusions instead of
    # emitting separate full-tensor copies. Blocks pick the per-head
    # [*, D] slice via the index map's head coordinate.
    q2 = q.reshape(b, sq, h * d)
    k2 = k.reshape(b, sk, h * d)
    v2 = v.reshape(b, sk, h * d)
    if sq_p != sq:
        q2 = jnp.pad(q2, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k2 = jnp.pad(k2, ((0, 0), (0, sk_p - sk), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, sk_p - sk), (0, 0)))
    # key padding forces the masked kernel even when mask is None
    has_mask = mask is not None or sk_p != sk
    if has_mask:
        if mask is None:
            mask = jnp.ones((b, sk), bool)
        mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))

    scale = 1.0 / np.sqrt(d)
    grid = (b, h, sq_p // bq)

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

    in_specs = [
        pl.BlockSpec((None, bq, d),
                     lambda bi, hi, qi: (bi, qi, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, sk_p, d),
                     lambda bi, hi, qi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, sk_p, d),
                     lambda bi, hi, qi: (bi, 0, hi),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q2, k2, v2]
    if has_mask:
        in_specs.append(pl.BlockSpec((b, sk_p), lambda bi, hi, qi: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask)
        kernel = functools.partial(_fwd_kernel, bk=bk, scale=scale,
                                   with_lse=with_lse, split=split)
    else:
        kernel = functools.partial(_fwd_kernel_nomask, bk=bk, scale=scale,
                                   with_lse=with_lse, split=split)

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shape if with_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel'),
            # fp32 inputs with a resident 4096-key block need ~17M of
            # scoped VMEM (fp32 K/V + [bq, sk] logits), just over the
            # 16M default; v5e has 128M physical
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

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
                   mask_ref, dq_ref, *, bk: int, scale: float,
                   has_mask: bool):
    """dQ for one (batch, head, q-block): loop over K blocks.

    q/do: [bq, D]; k/v: [Sk, D]; lse/delta: [bq, LANES]; mask: [B, Sk].
    dS = P * (dO V^T - delta); dQ = scale * dS K — the scale multiply is
    deferred to the [bq, D] epilogue, and P is recomputed in the exp2
    domain from q pre-scaled by scale*log2(e).
    """
    bq, d = q_ref.shape
    sk = k_ref.shape[0]
    bi = pl.program_id(0)
    dt = q_ref.dtype

    q = (q_ref[:].astype(jnp.float32) * (scale * LOG2E)).astype(dt)
    do = do_ref[:]
    lse2 = lse_ref[:, 0:1] * LOG2E  # natural log -> log2 units
    delta = delta_ref[:, 0:1]

    def body(kb, dq_acc):
        k = k_ref[pl.ds(kb * bk, bk), :]
        v = v_ref[pl.ds(kb * bk, bk), :]

        s2 = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # log2 units
        if has_mask:
            mask = mask_ref[bi, pl.ds(kb * bk, bk)]
            bias = jnp.where(mask != 0, 0.0, NEG_INF)
            s2 = s2 + bias[None, :]
        p = jnp.exp2(s2 - lse2)

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        ds = ((dp - delta) * p).astype(dt)
        return dq_acc + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, sk // bk, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    mask_ref, dk_ref, dv_ref, *, bq: int, scale: float,
                    has_mask: bool):
    """dK/dV for one (batch, head, k-block): loop over Q blocks.

    k/v: [bk, D]; q/do: [Sq, D]; lse/delta: [Sq, LANES]; mask: [B, Sk].
    dV = P^T dO; dK = scale * dS^T Q (scale deferred to the epilogue).
    """
    bk_, d = k_ref.shape
    sq = q_ref.shape[0]
    bi = pl.program_id(0)
    ki = pl.program_id(2)
    dt = q_ref.dtype

    k = k_ref[:]
    v = v_ref[:]
    if has_mask:
        mask = mask_ref[bi, pl.ds(ki * bk_, bk_)]
        bias = jnp.where(mask != 0, 0.0, NEG_INF)  # [bk]

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = (q_ref[pl.ds(qb * bq, bq), :].astype(jnp.float32)
             * (scale * LOG2E)).astype(dt)
        do = do_ref[pl.ds(qb * bq, bq), :]
        lse2 = lse_ref[pl.ds(qb * bq, bq), 0:1] * LOG2E
        delta = delta_ref[pl.ds(qb * bq, bq), 0:1]

        s2 = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk], log2 units
        if has_mask:
            s2 = s2 + bias[None, :]
        p = jnp.exp2(s2 - lse2)

        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(dt), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, D]

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        ds = ((dp - delta) * p).astype(dt)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, D]
        return dk_acc, dv_acc

    dk, dv = jax.lax.fori_loop(
        0, sq // bq, body,
        (jnp.zeros((bk_, d), jnp.float32), jnp.zeros((bk_, d), jnp.float32)))
    # q carried scale*log2e into s2; dk = d(s)/dk needs plain scale * dS^T Q
    # with Q unscaled, so divide the folded log2e back out: scale/(scale*log2e)
    dk_ref[:] = (dk * (1.0 / LOG2E)).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      mask_ref, dq_ref, dk_ref, dv_ref, *, bk: int,
                      scale: float, has_mask: bool):
    """Fused dQ/dK/dV for one (batch, head, q-block).

    Single-pass design: the two-kernel backward recomputed P twice and
    ran 7 matmuls per (q, k) block pair; this kernel computes
    s2/p/dp/ds ONCE and runs the minimal 5 matmuls (s2, dp, dV, dK, dQ).
    The q-block grid dimension is sequential ('arbitrary'): dk/dv output
    blocks map to the same (batch, head) block for every q step, so they
    stay VMEM-resident and accumulate across grid steps (zeroed at
    qi == 0).  Measured on v5e at the model's shapes: 13.9 -> 9.3 ms
    (ray self-attn 4096^2 B8) vs the two-kernel design.

    q/do/dq: [bq, D]; k/v: [Sk, D]; dk/dv: [Sk, D] fp32;
    lse/delta: [bq, LANES]; mask: [B, Sk].
    """
    bq_, d = q_ref.shape
    sk = k_ref.shape[0]
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    dt = q_ref.dtype

    @pl.when(qi == 0)
    def _zero():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = (q_ref[:].astype(jnp.float32) * (scale * LOG2E)).astype(dt)
    do = do_ref[:]
    lse2 = lse_ref[:, 0:1] * LOG2E  # natural log -> log2 units
    delta = delta_ref[:, 0:1]

    def body(kb, dq_acc):
        ks = pl.ds(kb * bk, bk)
        k = k_ref[ks, :]
        v = v_ref[ks, :]

        s2 = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk], log2 units
        if has_mask:
            mask = mask_ref[bi, ks]
            s2 = s2 + jnp.where(mask != 0, 0.0, NEG_INF)[None, :]
        p = jnp.exp2(s2 - lse2)

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        ds = ((dp - delta) * p).astype(dt)

        dv_ref[ks, :] += jax.lax.dot_general(
            p.astype(dt), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # q carried scale*log2e; dk needs plain scale * dS^T Q_unscaled
        dk_ref[ks, :] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / LOG2E)
        return dq_acc + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, sk // bk, body,
                           jnp.zeros((bq_, d), jnp.float32))
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bq', 'bk', 'interpret'))
def _flash_bwd_fused(q, k, v, mask, out, lse, do, bq: int, bk: int,
                     interpret: bool):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = min(bq, BWD_MAX_BQ)
    bk = min(bk, BWD_MAX_BK)
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
    has_mask = mask is not None or sk_p != sk
    if has_mask:
        if mask is None:
            mask = jnp.ones((b, sk), bool)
        mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))
    else:
        mask = jnp.zeros((b, sk_p), jnp.int32)  # operand kept for spec parity

    scale = 1.0 / np.sqrt(d)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # [B, sq_p, H]
    delta = jnp.broadcast_to(
        delta[..., None], (b, sq_p, h, LANES)).reshape(b, sq_p, h * LANES)

    q2 = q.reshape(b, sq_p, h * d)
    k2 = k.reshape(b, sk_p, h * d)
    v2 = v.reshape(b, sk_p, h * d)
    do2 = do.reshape(b, sq_p, h * d)

    qspec = pl.BlockSpec((None, bq, d), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((None, sk_p, d), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM)
    lm_spec = pl.BlockSpec((None, bq, LANES), lambda bi, hi, qi: (bi, qi, hi),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((b, sk_p), lambda bi, hi, qi: (0, 0),
                             memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, bk=bk, scale=scale,
                          has_mask=has_mask),
        grid=(b, h, sq_p // bq),
        in_specs=[qspec, kspec, kspec, qspec, lm_spec, lm_spec, mask_spec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(jax.ShapeDtypeStruct((b, sq_p, h * d), q.dtype),
                   jax.ShapeDtypeStruct((b, sk_p, h * d), jnp.float32),
                   jax.ShapeDtypeStruct((b, sk_p, h * d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
            # resident K/V + fp32 dK/dV accumulators + [bq, bk] fp32
            # temporaries overflow the default 16M scoped window at
            # Sk=4096 by <1M; v5e has 128M physical VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q2, k2, v2, do2, lse, delta, mask)

    dq = dq.reshape(b, sq_p, h, d)
    dk = dk.reshape(b, sk_p, h, d).astype(k.dtype)
    dv = dv.reshape(b, sk_p, h, d).astype(v.dtype)
    if sq_p != sq:
        dq = dq[:, :sq, :, :]
    if sk_p != sk:
        dk = dk[:, :sk, :, :]
        dv = dv[:, :sk, :, :]
    return dq, dk, dv


@functools.partial(jax.jit, static_argnames=('bq', 'bk', 'interpret'))
def _flash_bwd_twokernel(q, k, v, mask, out, lse, do, bq: int, bk: int,
                         interpret: bool):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    # the forward may run a single large K block; the backward kernels
    # keep full K (dQ) / full Q (dKV) resident plus fp32 [bq, bk] blocks,
    # so clamp their loop blocks. Shrinking is always safe: the backward
    # derives its own q/k padding, and the forward-made lse
    # ([B, round_up(sq, fwd bq), H*LANES]) is at least as long as the
    # backward's q padding, so its blocks stay in range.
    bq = min(bq, BWD_MAX_BQ)
    bk = min(bk, BWD_MAX_BK)
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
    has_mask = mask is not None or sk_p != sk
    if has_mask:
        if mask is None:
            mask = jnp.ones((b, sk), bool)
        mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))
    else:
        mask = jnp.zeros((b, sk_p), jnp.int32)  # operand kept for spec parity
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
        functools.partial(_bwd_dq_kernel, bk=bk, scale=scale,
                          has_mask=has_mask),
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
        functools.partial(_bwd_dkv_kernel, bq=bq, scale=scale,
                          has_mask=has_mask),
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


def _fused_bwd_enabled() -> bool:
    """Fused single-pass backward, default ON (5 matmuls + 1 P-recompute
    per block pair vs the two-kernel design's 7 + 2; measured 13.9 ->
    9.3 ms at ray-self 4096^2 B8 on v5e).  RFTPU_FUSED_BWD=0 falls back
    to the two-kernel path."""
    import os
    return os.environ.get('RFTPU_FUSED_BWD', '1') != '0'


def _flash_bwd(q, k, v, mask, out, lse, do, bq: int, bk: int,
               interpret: bool):
    if _fused_bwd_enabled():
        return _flash_bwd_fused(q, k, v, mask, out, lse, do, bq, bk,
                                interpret)
    return _flash_bwd_twokernel(q, k, v, mask, out, lse, do, bq, bk,
                                interpret)


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, mask, bq, bk, interpret, split=1):
    return _flash_fwd(q, k, v, mask, bq, bk, interpret, split=split)


def _flash_vjp_fwd(q, k, v, mask, bq, bk, interpret, split=1):
    out, lse = _flash_fwd(q, k, v, mask, bq, bk, interpret, with_lse=True,
                          split=split)
    return out, (q, k, v, mask, out, lse)


def _flash_vjp_bwd(bq, bk, interpret, split, res, g):
    q, k, v, mask, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, mask, out, lse, g, bq, bk, interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_nomask(q, k, v, bq, bk, interpret, split=1):
    return _flash_fwd(q, k, v, None, bq, bk, interpret, split=split)


def _flash_nomask_vjp_fwd(q, k, v, bq, bk, interpret, split=1):
    out, lse = _flash_fwd(q, k, v, None, bq, bk, interpret, with_lse=True,
                          split=split)
    return out, (q, k, v, out, lse)


def _flash_nomask_vjp_bwd(bq, bk, interpret, split, res, g):
    q, k, v, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, None, out, lse, g, bq, bk, interpret)
    return dq, dk, dv


_flash_nomask.defvjp(_flash_nomask_vjp_fwd, _flash_nomask_vjp_bwd)


def _default_bq(sq: int, sk: int) -> int:
    """Forward q-block rows (v5e-tuned; RFTPU_FLASH_BQ sweeps it).

    Large q sequences (ray tokens, sq>=4096) measure fastest at
    1024-row blocks: 95% of the matmul ideal at 4096^2 self-attn with
    split=4, and at the masked cross shape (Sk~2k) the round-5 sweep
    moved the optimum from 512/4 to 1024 as well (H=6: 1.659 -> 1.531,
    H=8: 2.509 -> 2.258 with split=8 — tools/cross_micro.py).  Short q
    keeps 512."""
    import os
    env = os.environ.get('RFTPU_FLASH_BQ')
    if env is not None:
        return int(env)
    return 1024 if sq >= 4096 else 512


def flash_attention(q, k, v, mask=None,
                    bq: Optional[int] = None, bk: Optional[int] = None,
                    interpret: Optional[bool] = None):
    """Masked flash attention.

    q: [B, Sq, H, D]; k/v: [B, Sk, H, D]
    mask: broadcastable key mask; accepts [B, Sk] or [B, 1, 1, Sk] bool
          (True = attend), or None (compiles a kernel with no mask work).
    bk=None picks the default K-block policy (see _pick_bk).
    """
    if mask is not None and mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    sq, sk = q.shape[1], k.shape[1]
    bq = min(bq if bq is not None else _default_bq(sq, sk),
             _round_up(sq, 128))
    bk = _pick_bk(sk, bk)
    split = _fwd_q_split(bq, bk, sk, q.shape[2])
    if mask is None:
        return _flash_nomask(q, k, v, bq, bk, interpret, split)
    return _flash(q, k, v, mask, bq, bk, interpret, split)


# ---------------------------------------------------------------------------
# RoPE-fused forward (default; RFTPU_FUSE_ROPE=0 opts out)
#
# Rotates q in fp32 inside the kernel prologue instead of materializing
# a rotated copy through HBM (the XLA rotate-half fusions cost ~3 ms /
# 4 views in device profiles). The q-side cos/sin tables are pre-scaled
# by softmax_scale * log2(e) outside the kernel (rotation is linear), so
# the rotated q lands pre-scaled for the exp2-domain softmax at zero
# kernel cost. K is pre-rotated by XLA OUTSIDE the kernel: an in-kernel
# K rotation would be redone for every q-block (8x redundant VPU work at
# 4096 tokens) and keeping the K tables VMEM-resident blocks the
# single-K-block softmax that measures fastest (82% vs 53% MXU util);
# the XLA pre-rotation is one fused streaming pass (~0.1 ms).
#
# The rotation is orthogonal, so the backward pass rotates the primals
# forward again (recompute) and inverse-rotates dq/dk with negated sin.
# ---------------------------------------------------------------------------

def _rot(x32, cos, sin):
    """HF rotate-half applied in fp32: x*cos + rotate_half(x)*sin."""
    half = x32.shape[-1] // 2
    rot = jnp.concatenate([-x32[:, half:], x32[:, :half]], axis=-1)
    return x32 * cos + rot * sin


def _rot_bhsd(x, cos, sin):
    """apply_rope on [B, S, H, D] with head-shared [B, S, D] tables."""
    x32 = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x32[..., half:], x32[..., :half]], axis=-1)
    return (x32 * cos[:, :, None, :] + rot * sin[:, :, None, :]).astype(x.dtype)


def _rot_kv_kernel(k_ref, cos_ref, sin_ref, o_ref):
    """Broadcast-rotate: per-scene K rows x per-view tables.

    k_ref [rows, H, D] (the SCENE's K — the index map replays it for
    every view), cos/sin [rows, D] fp32 (this view's tables), out
    [rows, H, D].  Replaces the XLA pre-rotation pass, which
    materialized the per-scene fp32 rotate-half intermediates broadcast
    over views (24 standalone [V,Sk,H,D/2] broadcasts, ~2.6 ms/step in
    the 483M/512^2 profile)."""
    x = k_ref[...].astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos_ref[...][:, None, :]
    s = sin_ref[...][:, None, :]
    o_ref[...] = (x * c + rot * s).astype(o_ref.dtype)


def _rot_kv_broadcast(k1, cos, sin, sk_p: int, interpret: bool):
    """k1 [Bkv, Sk, H, D] bf16 (Bkv divides B), cos/sin [B, Sk, D] fp32
    -> rotated flat K [B, sk_p, Hp*D] (zero-padded rows), with the head
    axis padded up to a multiple of 8: H rides the SUBLANE axis of the
    kernel blocks, and 6-head models (v1-base) measured a 4.6% e2e
    regression on the padded 6-of-8 tiles.  The zero pad costs one tiny
    per-scene copy; the main kernel's per-head index maps simply never
    touch the pad heads.  Callers must size their k-blocks over Hp*D."""
    b = cos.shape[0]
    bkv, sk, h, d = k1.shape
    reps = b // bkv
    hp = _round_up(h, 8)
    if sk != sk_p or hp != h:
        k1 = jnp.pad(k1, ((0, 0), (0, sk_p - sk), (0, hp - h), (0, 0)))
        cos = jnp.pad(cos, ((0, 0), (0, sk_p - sk), (0, 0)))
        sin = jnp.pad(sin, ((0, 0), (0, sk_p - sk), (0, 0)))
    # 512-row cap: at 1024 rows the fp32 rotate intermediates of an
    # 8-head block exceeded the scoped-vmem stack limit (36.4M vs
    # 35.5M) once the head pad landed
    rows = next((r for r in (512, 256, 128)
                 if sk_p % r == 0), sk_p)
    out = pl.pallas_call(
        _rot_kv_kernel,
        grid=(b, sk_p // rows),
        in_specs=[
            pl.BlockSpec((None, rows, hp, d),
                         lambda bi, si: (bi // reps, si, 0, 0)),
            pl.BlockSpec((None, rows, d), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((None, rows, d), lambda bi, si: (bi, si, 0)),
        ],
        out_specs=pl.BlockSpec((None, rows, hp, d),
                               lambda bi, si: (bi, si, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sk_p, hp, d), k1.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
    )(k1, cos, sin)
    return out.reshape(b, sk_p, hp * d)


def _fwd_qrope_kernel(q_ref, k_ref, v_ref, mask_ref, cosq_ref, sinq_ref,
                      o_ref, lse_ref=None, *, bk: int, with_lse: bool,
                      split: int = 1):
    """Masked variant; cosq/sinq arrive pre-scaled by scale*log2(e)."""
    sk = k_ref.shape[0]
    bi = pl.program_id(0)
    q = _rot(q_ref[:].astype(jnp.float32),
             cosq_ref[:], sinq_ref[:]).astype(q_ref.dtype)
    acc, m2, l = _fwd_body(q, k_ref, v_ref, mask_ref, bi, sk // bk, bk, split)
    _fwd_epilogue(acc, m2, l, o_ref, lse_ref, with_lse)


def _fwd_qrope_kernel_nomask(q_ref, k_ref, v_ref, cosq_ref, sinq_ref,
                             o_ref, lse_ref=None, *, bk: int,
                             with_lse: bool, split: int = 1):
    sk = k_ref.shape[0]
    q = _rot(q_ref[:].astype(jnp.float32),
             cosq_ref[:], sinq_ref[:]).astype(q_ref.dtype)
    acc, m2, l = _fwd_body(q, k_ref, v_ref, None, 0, sk // bk, bk, split)
    _fwd_epilogue(acc, m2, l, o_ref, lse_ref, with_lse)


@functools.partial(jax.jit,
                   static_argnames=('bq', 'bk', 'interpret', 'with_lse',
                                    'split', 'rot_kernel'))
def _flash_fwd_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                    bq: int, bk: int, interpret: bool,
                    with_lse: bool = False, split: int = 1,
                    rot_kernel: bool = True):
    """cos/sin: [B, S, D] fp32, shared across heads.

    k/v may carry a SMALLER batch Bkv dividing B (the per-view fan-out
    of shared scene K/V): K is broadcast-rotated by the pallas
    _rot_kv_broadcast pass (per-view tables, per-scene rows) and V is
    consumed per-scene straight from HBM via the index map — neither
    the V broadcast nor the fp32 rotate-half intermediates ever
    materialize per view."""
    b, sq, h, d = q.shape
    bkv, sk = k.shape[0], k.shape[1]
    reps = b // bkv
    sq_p = _round_up(sq, bq)
    sk_p = _round_up(sk, bk)

    # flatten first, pad on the flat shape (flat fusion roots absorb
    # the custom-call layout normalization — round-1 note)
    q2 = q.reshape(b, sq, h * d)
    if rot_kernel and d % 128 == 0:
        k2 = _rot_kv_broadcast(k, cosk, sink, sk_p, interpret)
    else:
        # XLA rotation (materializes the view fan-out + fp32
        # intermediates; cheaper than half-lane kernel tiles at D=64)
        kb = _bcast_kv(k, reps)
        k2 = _rot_bhsd(kb, cosk, sink).reshape(b, sk, h * d)
        if sk_p != sk:
            k2 = jnp.pad(k2, ((0, 0), (0, sk_p - sk), (0, 0)))
    v2 = v.reshape(bkv, sk, h * d)

    if sq_p != sq:
        q2 = jnp.pad(q2, ((0, 0), (0, sq_p - sq), (0, 0)))
        cosq = jnp.pad(cosq, ((0, 0), (0, sq_p - sq), (0, 0)))
        sinq = jnp.pad(sinq, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        v2 = jnp.pad(v2, ((0, 0), (0, sk_p - sk), (0, 0)))
    has_mask = mask is not None or sk_p != sk
    if has_mask:
        if mask is None:
            mask = jnp.ones((b, sk), bool)
        mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))

    scale = 1.0 / np.sqrt(d)
    # fold softmax scale + exp2 rebase into the q-side rotation tables
    cosq = cosq * (scale * LOG2E)
    sinq = sinq * (scale * LOG2E)
    grid = (b, h, sq_p // bq)

    def fold_spec(block_s):
        return pl.BlockSpec((None, block_s, d),
                            lambda bi, hi, qi: (bi, qi, hi),
                            memory_space=pltpu.VMEM)

    def fold_full_k():
        return pl.BlockSpec((None, sk_p, d),
                            lambda bi, hi, qi: (bi, 0, hi),
                            memory_space=pltpu.VMEM)

    def fold_full_v():
        # per-scene V: replay the scene's rows for each of its views
        return pl.BlockSpec((None, sk_p, d),
                            lambda bi, hi, qi: (bi // reps, 0, hi),
                            memory_space=pltpu.VMEM)

    def rope_q_spec():
        return pl.BlockSpec((None, bq, d),
                            lambda bi, hi, qi: (bi, qi, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((b, sq_p, h * d), q.dtype)]
    out_specs = [fold_spec(bq)]
    if with_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b, sq_p, h * LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((None, bq, LANES),
                                      lambda bi, hi, qi: (bi, qi, hi),
                                      memory_space=pltpu.VMEM))

    in_specs = [fold_spec(bq), fold_full_k(), fold_full_v()]
    operands = [q2, k2, v2]
    if has_mask:
        in_specs.append(pl.BlockSpec((b, sk_p), lambda bi, hi, qi: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask)
        kernel = functools.partial(_fwd_qrope_kernel, bk=bk,
                                   with_lse=with_lse, split=split)
    else:
        kernel = functools.partial(_fwd_qrope_kernel_nomask, bk=bk,
                                   with_lse=with_lse, split=split)
    in_specs += [rope_q_spec(), rope_q_spec()]
    operands += [cosq, sinq]

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if with_lse else out_specs[0],
        out_shape=out_shape if with_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel'),
            vmem_limit_bytes=64 * 1024 * 1024),  # see _flash_fwd
        interpret=interpret,
    )(*operands)

    if with_lse:
        out, lse = res
    else:
        out, lse = res, None
    out = out.reshape(b, sq_p, h, d)
    if sq_p != sq:
        out = out[:, :sq, :, :]
    return (out, lse) if with_lse else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _flash_rope(q, k, v, mask, cosq, sinq, cosk, sink, bq, bk, interpret,
                split=1, rot_kernel=True):
    return _flash_fwd_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                           bq, bk, interpret, split=split,
                           rot_kernel=rot_kernel)


def _flash_rope_vjp_fwd(q, k, v, mask, cosq, sinq, cosk, sink,
                        bq, bk, interpret, split=1, rot_kernel=True):
    out, lse = _flash_fwd_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                               bq, bk, interpret, with_lse=True, split=split,
                               rot_kernel=rot_kernel)
    return out, (q, k, v, mask, cosq, sinq, cosk, sink, out, lse)


def _bcast_kv(x, reps):
    """[Bkv, S, H, D] -> [Bkv*reps, S, H, D] (view-major fan-out)."""
    if reps == 1:
        return x
    bkv = x.shape[0]
    return jnp.broadcast_to(x[:, None], (bkv, reps) + x.shape[1:]
                            ).reshape((bkv * reps,) + x.shape[1:])


def _reduce_kv_grad(dx, reps):
    """Transpose of _bcast_kv: sum the per-view cotangents per scene."""
    if reps == 1:
        return dx
    b = dx.shape[0]
    return dx.reshape((b // reps, reps) + dx.shape[1:]).sum(axis=1)


def _flash_rope_vjp_bwd(bq, bk, interpret, split, rot_kernel, res, g):
    q, k, v, mask, cosq, sinq, cosk, sink, out, lse = res
    # recompute rotated primals, run the standard backward, then rotate
    # dq/dk back (orthogonal rotation: inverse == negated sin).  k/v may
    # be per-scene (batch Bkv < B): the backward materializes the view
    # fan-out (training-path cost only) and sums the cotangents back.
    reps = q.shape[0] // k.shape[0]
    q_rot = _rot_bhsd(q, cosq, sinq)
    k_rot = _rot_bhsd(_bcast_kv(k, reps), cosk, sink)
    dq_rot, dk_rot, dv = _flash_bwd(q_rot, k_rot, _bcast_kv(v, reps),
                                    mask, out, lse, g, bq, bk, interpret)
    dq = _rot_bhsd(dq_rot, cosq, -sinq)
    dk = _reduce_kv_grad(_rot_bhsd(dk_rot, cosk, -sink), reps)
    dv = _reduce_kv_grad(dv, reps)
    zq = jnp.zeros_like(cosq)
    zk = jnp.zeros_like(cosk)
    return dq, dk, dv, None, zq, zq, zk, zk


_flash_rope.defvjp(_flash_rope_vjp_fwd, _flash_rope_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _flash_rope_nomask(q, k, v, cosq, sinq, cosk, sink, bq, bk, interpret,
                       split=1, rot_kernel=True):
    return _flash_fwd_rope(q, k, v, None, cosq, sinq, cosk, sink,
                           bq, bk, interpret, split=split,
                           rot_kernel=rot_kernel)


def _flash_rope_nomask_vjp_fwd(q, k, v, cosq, sinq, cosk, sink,
                               bq, bk, interpret, split=1, rot_kernel=True):
    out, lse = _flash_fwd_rope(q, k, v, None, cosq, sinq, cosk, sink,
                               bq, bk, interpret, with_lse=True, split=split,
                               rot_kernel=rot_kernel)
    return out, (q, k, v, cosq, sinq, cosk, sink, out, lse)


def _flash_rope_nomask_vjp_bwd(bq, bk, interpret, split, rot_kernel, res, g):
    q, k, v, cosq, sinq, cosk, sink, out, lse = res
    reps = q.shape[0] // k.shape[0]
    q_rot = _rot_bhsd(q, cosq, sinq)
    k_rot = _rot_bhsd(_bcast_kv(k, reps), cosk, sink)
    dq_rot, dk_rot, dv = _flash_bwd(q_rot, k_rot, _bcast_kv(v, reps),
                                    None, out, lse, g, bq, bk, interpret)
    dq = _rot_bhsd(dq_rot, cosq, -sinq)
    dk = _reduce_kv_grad(_rot_bhsd(dk_rot, cosk, -sink), reps)
    dv = _reduce_kv_grad(dv, reps)
    zq = jnp.zeros_like(cosq)
    zk = jnp.zeros_like(cosk)
    return dq, dk, dv, zq, zq, zk, zk


_flash_rope_nomask.defvjp(_flash_rope_nomask_vjp_fwd,
                          _flash_rope_nomask_vjp_bwd)


def flash_attention_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                         bq: Optional[int] = None, bk: Optional[int] = None,
                         interpret=None):
    """Flash attention with fp32 q-RoPE fused into the kernel prologue
    (K is pre-rotated by the pallas broadcast-rotate pass or one fused
    XLA pass — see module docstring).

    q: [B, Sq, H, D]; k/v: [Bkv, Sk, H, D] where Bkv divides B (the
    per-view fan-out of shared scene K/V — the kernel replays per-scene
    rows via its index maps, view-major, and never materializes the
    broadcast); cos/sin: [B, S, 1, D] or [B, S, D] fp32 (head-shared,
    per-view on BOTH sides); mask: [B, Sk] or [B, 1, 1, Sk] bool,
    True = attend, or None (compiles a kernel with no mask work).
    """
    if mask is not None and mask.ndim == 4:
        mask = mask[:, 0, 0, :]
    if cosq.ndim == 4:
        cosq, sinq = cosq[:, :, 0, :], sinq[:, :, 0, :]
    if cosk.ndim == 4:
        cosk, sink = cosk[:, :, 0, :], sink[:, :, 0, :]
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    sq, sk = q.shape[1], k.shape[1]
    bq = min(bq if bq is not None else _default_bq(sq, sk),
             _round_up(sq, 128))
    bk = _pick_bk(sk, bk)
    split = _fwd_q_split(bq, bk, sk, q.shape[2])
    # stop-gradient on the tables: positions are no-grad in the reference
    cosq = jax.lax.stop_gradient(cosq.astype(jnp.float32))
    sinq = jax.lax.stop_gradient(sinq.astype(jnp.float32))
    cosk = jax.lax.stop_gradient(cosk.astype(jnp.float32))
    sink = jax.lax.stop_gradient(sink.astype(jnp.float32))
    # Broadcast-rotate kernel where it measures ahead (v5e, 512^2):
    # always on the per-scene fan-out sites (reps > 1 — the kernel
    # exists to avoid materializing the view broadcast), and on
    # reps == 1 sites only for natively 8-aligned head counts (483M
    # H=8: -11 ms/step, 176.0 -> 165.0).  For 6-head reps-1 sites the
    # XLA single-pass rotate wins even against head-padded kernel tiles
    # (87.6 vs 90.5 all-kernel / 91.8 unpadded on v1-base).
    # RFTPU_ROT_KV=0/1 forces either arm.  Decided HERE — outside the
    # jitted _flash_fwd_rope — and threaded through as a static arg so
    # the inner jit cache keys on it (an env read below the jit
    # boundary would be silently frozen by the trace cache).
    import os
    b, h, d = q.shape[0], q.shape[2], q.shape[3]
    reps = b // k.shape[0]
    env = os.environ.get('RFTPU_ROT_KV', '')
    rot_kernel = ((d % 128 == 0 and (reps > 1 or h % 8 == 0))
                  if env == '' else (env != '0'))
    if mask is None:
        return _flash_rope_nomask(q, k, v, cosq, sinq, cosk, sink,
                                  bq, bk, interpret, split, rot_kernel)
    return _flash_rope(q, k, v, mask, cosq, sinq, cosk, sink,
                       bq, bk, interpret, split, rot_kernel)
