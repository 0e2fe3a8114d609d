"""Pallas TPU kernel for the Swin shifted-window regroup — a
scalar-prefetch gather that consumes the shifted grouping directly from
HBM (VERDICT r4 next #1).

The decoder keeps its residual stream in unshifted-window order
(nn/attention.py seq_to_window_order), so shifted layers must regroup
[B, S, C] into shifted-window order before the pair-window attention
kernel and back after it.  Round 4 did this with XLA slice/roll/concat
chains (nn/attention.py shifted_regroup) — semantically two axis rolls
on the 6-D window view, but XLA lowers them to many small strided
copies: the swin-large HEAD profile attributed ~20 ms/step to this
machinery (docs/performance.md "Known headroom" #1), 10x the ~2 ms of
HBM traffic the permutation actually needs.

TPU-native design: because the reference's only shift is ws/2
(/root/reference/renderformer/layers/attention.py:656 alternates
shift 0 and window_size // 2), every shifted window is exactly four
quadrant blocks of four source windows:

    out[wr, wc, bi*s:.., bj*s:..] = x[src(wr,bi), src(wc,bj),
                                      (1-bi)*s:.., (1-bj)*s:..]

with s = ws/2 and src wrapping mod the window grid.  The kernel is a
pure block-DMA pump over grid (n_windows, 4 quadrants): the input
BlockSpec's index map reads a scalar-prefetched [nW, 4] source-window
table (pltpu.PrefetchScalarGridSpec) and arithmetic on the quadrant
index; the kernel body is one memcpy.  No in-register shuffles, no
sub-tile writes, no read amplification — input and output blocks are
both exact quadrants [B, s, s, C], and the views axis rides inside the
block so the grid stays small (256 programs at 512^2/B=8).

The inverse regroup is the same kernel with a different window table
(for shift = ws/2 the quadrant<->quadrant block mapping is identical in
both directions: (i +- s) mod ws flips the half either way).  The VJP
of a permutation is its inverse, so backward is one more kernel launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=64)
def _window_table(wr: int, wc: int, inverse: bool) -> np.ndarray:
    """[nW, 4] int32: source window index for (dest window, quadrant).

    Quadrant k = 2*bi + bj over the (row, col) half-window bits.
    Forward (regroup into shifted order, i.e. partition(roll(x, -s))):
        src = ((r + bi) % wr, (c + bj) % wc)
    Inverse (back to unshifted order, partition(roll(x, +s))):
        src = ((r + bi - 1) % wr, (c + bj - 1) % wc)
    """
    r = np.arange(wr)[:, None, None, None]
    c = np.arange(wc)[None, :, None, None]
    bi = np.arange(2)[None, None, :, None]
    bj = np.arange(2)[None, None, None, :]
    d = -1 if inverse else 0
    src = ((r + bi + d) % wr) * wc + ((c + bj + d) % wc)
    return src.reshape(wr * wc, 4).astype(np.int32)


def _copy_kernel(tbl_ref, s0_ref, s1_ref, o_ref):
    """One (window, row-half) program: assemble the dest row-half from
    the two source windows' opposite row-halves, swapping column halves
    in place (s0 = same-column source, s1 = next-column source).
    Refs [B, s, ws, C]."""
    del tbl_ref
    s = o_ref.shape[2] // 2
    o_ref[:, :, :s, :] = s0_ref[:, :, s:, :]
    o_ref[:, :, s:, :] = s1_ref[:, :, :s, :]


@functools.partial(jax.jit,
                   static_argnames=('grid_hw', 'ws', 'interpret'))
def _regroup_call(x, tbl, grid_hw, ws: int, interpret: bool):
    b, seq, c = x.shape
    h, w = grid_hw
    wr, wc = h // ws, w // ws
    nw = wr * wc
    s = ws // 2
    # [B, nW, i, j, C]: pure leading-dim split of [B, S, C] — the
    # (ws=8, C) trailing dims keep the native T(8,128) tiling, so the
    # reshape is a free bitcast (a first cut used a 7-D quadrant view
    # whose (4, C) trailing dims forced T(4,128) relayout copies worth
    # ~2.7 ms/step around the kernel).  Row halves are selected by the
    # block index; column halves by in-kernel sublane slices.
    x5 = x.reshape(b, nw, ws, ws, c)

    # program (w, bi): dest rows [bi*s, bi*s+s) of window w gather from
    # source windows tbl[w, 2*bi + bj]'s row-half (1-bi), bj = col half
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nw, 2),
            in_specs=[
                pl.BlockSpec(
                    (b, None, s, ws, c),
                    lambda wi, bi, tbl: (0, tbl[wi, 2 * bi], 1 - bi, 0, 0),
                ),
                pl.BlockSpec(
                    (b, None, s, ws, c),
                    lambda wi, bi, tbl: (0, tbl[wi, 2 * bi + 1], 1 - bi,
                                         0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (b, None, s, ws, c),
                lambda wi, bi, tbl: (0, wi, bi, 0, 0),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nw, ws, ws, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
    )(tbl, x5, x5)
    return out.reshape(b, seq, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def shifted_regroup_kernel(x, grid_hw, ws: int, inverse: bool = False,
                           interpret: bool = False):
    """Pallas shifted-window regroup on a window-ordered stream.

    x: [B, S, C] in unshifted-window order (or shifted order when
    ``inverse``); grid_hw = (H, W) patch grid; shift is implicitly
    ws // 2 (the only shift the reference uses).  Drop-in for
    nn.attention.shifted_regroup(x, h, w, ws, ws // 2, inverse).
    """
    tbl = jnp.asarray(_window_table(grid_hw[0] // ws, grid_hw[1] // ws,
                                    inverse))
    return _regroup_call(x, tbl, grid_hw, ws, interpret)


def _srk_fwd(x, grid_hw, ws, inverse, interpret):
    return shifted_regroup_kernel(x, grid_hw, ws, inverse, interpret), None


def _srk_bwd(grid_hw, ws, inverse, interpret, _res, g):
    # transpose of a permutation = its inverse permutation
    return (shifted_regroup_kernel(g, grid_hw, ws, not inverse, interpret),)


shifted_regroup_kernel.defvjp(_srk_fwd, _srk_bwd)


def regroup_kernel_applicable(seq: int, grid_hw, ws: int,
                              shift: int) -> bool:
    """Static gate: the kernel covers the reference's shift pattern
    (shift = ws/2, even window grid dims; attention.py:656)."""
    if grid_hw is None:
        return False
    h, w = grid_hw
    return (shift * 2 == ws and h % ws == 0 and w % ws == 0
            and seq == h * w and (ws // 2) > 0)
