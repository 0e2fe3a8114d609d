"""Pallas TPU fused bilinear resize (align_corners=True) as two banded
matrix multiplies on the MXU.

Replaces the XLA gather+lerp formulation of
:func:`renderformer_tpu.nn.conv.resize_bilinear_align_corners` on TPU.
Device profiles of the v1-base 512² render put the DPT resize chain at
~9.7 ms/step: the per-axis gathers compile to custom gather fusions
(~0.8 ms each ×6), the H-axis lerp to a 2.4 ms loop fusion, and the
resulting {3,0,1,2} layout needs a 1.6 ms copy before the next conv.
(An interp-matrix einsum in XLA was tried first and lost to transposed
dot layouts — see nn/conv.py docstring.)

This kernel instead computes out = Mh · x · Mwᵀ per channel plane:
  * Mh [OH, IH], Mw [OW, IW] are the closed-form interpolation matrices
    (2 nonzeros per row — the same (1-f, f) pairs the gather path uses);
  * Mh is banded, so each output row block only needs a static-width
    window of input rows: the kernel DMAs x[b, w0(k) : w0(k)+R, :, :]
    HBM→VMEM per grid step (window starts precomputed to SMEM) and
    multiplies by the pre-windowed [bh, R] weight block — full-image
    VMEM residency is never needed;
  * the W pass runs as one [OW, IW] × [IW, C] matmul per output row,
    producing rows directly in the canonical NHWC minor layout (no
    post-hoc copies);
  * dense matmuls spend ~IW/2× redundant FLOPs on the zeros of the
    band — irrelevant next to the MXU rate vs. VPU gathers.

Linear map ⇒ the VJP applies the transposed matrices (also banded:
each input row influences a contiguous window of output rows) through
the same kernel, wired via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense [n_out, n_in] align_corners=True interp matrix, fp32."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(coords).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = (coords - i0).astype(np.float32)
    rows = np.arange(n_out)
    # lo first, hi second — accumulation order matches the lerp
    m[rows, i0] += (1.0 - frac)
    m[rows, i1] += frac
    return m


@functools.lru_cache(maxsize=64)
def _axis_matrices(ih: int, iw: int, oh: int, ow: int, transpose: bool):
    """(Mh [oh, ih], Mw [ow, iw]) mapping an [ih, iw] image to [oh, ow].

    ``transpose=True`` returns the adjoints of the (oh→ih, ow→iw) forward
    maps — the matrices the VJP applies to a cotangent of shape [ih, iw].
    """
    if transpose:
        mh = np.ascontiguousarray(_interp_matrix(oh, ih).T)
        mw = np.ascontiguousarray(_interp_matrix(ow, iw).T)
    else:
        mh = _interp_matrix(ih, oh)
        mw = _interp_matrix(iw, ow)
    return mh, mw


def _band_windows(m: np.ndarray, bh: int):
    """Per-row-block (start, width) of the nonzero column band of ``m``.

    Returns (starts [n_blocks] int32, R, windowed weights
    [n_blocks, bh, R]) with a uniform width R (max over blocks, clamped
    to the matrix).
    """
    n_out, n_in = m.shape
    n_blocks = n_out // bh
    starts, widths = [], []
    for k in range(n_blocks):
        blk = m[k * bh:(k + 1) * bh]
        nz = np.nonzero(np.abs(blk).sum(axis=0))[0]
        lo, hi = (int(nz[0]), int(nz[-1]) + 1) if len(nz) else (0, 1)
        starts.append(lo)
        widths.append(hi - lo)
    r = min(max(widths), n_in)
    starts = [min(s, n_in - r) for s in starts]
    wnd = np.stack([m[k * bh:(k + 1) * bh, starts[k]:starts[k] + r]
                    for k in range(n_blocks)])
    return np.asarray(starts, np.int32), r, wnd


def _kernel(starts_ref, mh_ref, mw_ref, x_hbm, o_ref, xw, tmp, sem, *,
            bh: int):
    b = pl.program_id(0)
    k = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(starts_ref[k], xw.shape[0]), :, :], xw, sem)
    dma.start()
    dma.wait()

    r, iw, c = xw.shape
    ow = mw_ref.shape[0]
    dt = o_ref.dtype
    # bf16 inputs hit the MXU natively (exact multiply, fp32 accumulate);
    # fp32 inputs need HIGHEST or default precision rounds them to one
    # bf16 pass. Mosaic rejects HIGHEST on bf16 operands, so pick per dtype.
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # H pass: [bh, R] @ [R, IW*C], fp32 accumulation
    t = jax.lax.dot_general(
        mh_ref[:].astype(dt), xw[:].reshape(r, iw * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)
    tmp[:] = t.astype(dt).reshape(bh, iw, c)

    # W pass: one [OW, IW] @ [IW, C] matmul per output row — rows land
    # directly in the canonical NHWC minor layout
    mw = mw_ref[:].astype(dt)

    def body(i, _):
        row = tmp[pl.ds(i, 1)].reshape(iw, c)
        o_ref[pl.ds(i, 1)] = jax.lax.dot_general(
            mw, row, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(dt).reshape(1, ow, c)
        return 0

    jax.lax.fori_loop(0, bh, body, 0)


def _plan(mh: np.ndarray, ow: int, iw: int, c: int, itemsize: int):
    """Pick the largest row block whose full VMEM footprint (input
    window + H-pass tmp + out block + weights) fits in ~10 MB.

    Returns (bh, starts, r, windowed_mh) or None if nothing fits.
    """
    oh = mh.shape[0]
    for bh in (128, 64, 32, 16, 8):
        if oh % bh != 0 or bh * ow * c * itemsize > 4 * 1024 * 1024:
            continue
        starts, r, wnd = _band_windows(mh, bh)
        bytes_needed = (r * iw * c + bh * iw * c + bh * ow * c) * itemsize \
            + ow * iw * 4 + bh * r * 4
        if bytes_needed < 10 * 1024 * 1024:
            return bh, starts, r, wnd
    return None


@functools.partial(jax.jit,
                   static_argnames=('oh', 'ow', 'transpose', 'interpret'))
def _apply2d(x, oh: int, ow: int, transpose: bool, interpret: bool):
    b, ih, iw, c = x.shape
    mh, mw = _axis_matrices(ih, iw, oh, ow, transpose)
    bh, starts, r, mh_wnd = _plan(mh, ow, iw, c, x.dtype.itemsize)
    n_blocks = oh // bh

    return pl.pallas_call(
        functools.partial(_kernel, bh=bh),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, bh, r), lambda bi, ki: (ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow, iw), lambda bi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, bh, ow, c), lambda bi, ki: (bi, ki, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, iw, c), x.dtype),
            pltpu.VMEM((bh, iw, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(jnp.asarray(starts), jnp.asarray(mh_wnd), jnp.asarray(mw), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _resize(x, oh, ow, interpret):
    return _apply2d(x, oh, ow, False, interpret)


def _resize_fwd(x, oh, ow, interpret):
    return _apply2d(x, oh, ow, False, interpret), (x.shape[1], x.shape[2])


def _resize_bwd(oh, ow, interpret, res, g):
    ih, iw = res
    return (_apply2d(g, ih, iw, True, interpret),)


_resize.defvjp(_resize_fwd, _resize_bwd)


def fused_resize(x, out_hw, interpret: bool = False):
    """[B, H, W, C] → [B, out_h, out_w, C], align_corners=True bilinear.

    Caller must check :func:`fused_resize_supported` first.
    """
    return _resize(x, int(out_hw[0]), int(out_hw[1]), interpret)


# ---------------------------------------------------------------------------
# Fused resize -> space-to-depth (the composed DPT tail's input transform)
#
# Emits the resized image DIRECTLY in s2d layout [B, OH/2, OW/2, 4C]
# (packing s2d(u)[i, j, (a*2+b)C + c] = u[2i+a, 2j+b, c]) so the 512^2
# NHWC tensor and the separate space_to_depth copy (measured 2.2 + 1.6
# ms/step on v5e at the v1-base shapes) are never materialized.  The
# W-pass uses parity-split interpolation matrices: out rows/cols of each
# parity are separate banded matmuls whose results concatenate along the
# channel axis — no in-kernel relayout.
# ---------------------------------------------------------------------------

def _kernel_s2d(starts_ref, mh_ref, mwe_ref, mwo_ref, x_hbm, o_ref,
                xw, tmp, sem, *, bh: int):
    b = pl.program_id(0)
    k = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(starts_ref[k], xw.shape[0]), :, :], xw, sem)
    dma.start()
    dma.wait()

    r, iw, c = xw.shape
    ow2 = mwe_ref.shape[0]
    dt = o_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    t = jax.lax.dot_general(
        mh_ref[:].astype(dt), xw[:].reshape(r, iw * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)
    tmp[:] = t.astype(dt).reshape(bh, iw, c)

    mwe = mwe_ref[:].astype(dt)
    mwo = mwo_ref[:].astype(dt)

    def wpass(row, m):
        return jax.lax.dot_general(
            m, row, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(dt)

    def body(i, _):
        row0 = tmp[pl.ds(2 * i, 1)].reshape(iw, c)
        row1 = tmp[pl.ds(2 * i + 1, 1)].reshape(iw, c)
        # four channel-range stores instead of an in-kernel concat (the
        # concat formulation hung the Mosaic compiler); each 128-lane
        # window is tile-aligned
        o_ref[pl.ds(i, 1), :, 0 * c:1 * c] = wpass(row0, mwe).reshape(
            1, ow2, c)
        o_ref[pl.ds(i, 1), :, 1 * c:2 * c] = wpass(row0, mwo).reshape(
            1, ow2, c)
        o_ref[pl.ds(i, 1), :, 2 * c:3 * c] = wpass(row1, mwe).reshape(
            1, ow2, c)
        o_ref[pl.ds(i, 1), :, 3 * c:4 * c] = wpass(row1, mwo).reshape(
            1, ow2, c)
        return 0

    jax.lax.fori_loop(0, bh // 2, body, 0)


@functools.partial(jax.jit, static_argnames=('oh', 'ow', 'interpret'))
def _apply2d_s2d(x, oh: int, ow: int, interpret: bool):
    b, ih, iw, c = x.shape
    mh, mw = _axis_matrices(ih, iw, oh, ow, False)
    bh, starts, r, mh_wnd = _plan(mh, ow, iw, c, x.dtype.itemsize)
    n_blocks = oh // bh

    return pl.pallas_call(
        functools.partial(_kernel_s2d, bh=bh),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, bh, r), lambda bi, ki: (ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow // 2, iw), lambda bi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow // 2, iw), lambda bi, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (None, bh // 2, ow // 2, 4 * c), lambda bi, ki: (bi, ki, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh // 2, ow // 2, 4 * c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, iw, c), x.dtype),
            pltpu.VMEM((bh, iw, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(jnp.asarray(starts), jnp.asarray(mh_wnd),
      jnp.asarray(np.ascontiguousarray(mw[0::2])),
      jnp.asarray(np.ascontiguousarray(mw[1::2])), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _resize_s2d(x, oh, ow, interpret):
    return _apply2d_s2d(x, oh, ow, interpret)


def _resize_s2d_fwd(x, oh, ow, interpret):
    return _apply2d_s2d(x, oh, ow, interpret), (x.shape[1], x.shape[2])


def _resize_s2d_bwd(oh, ow, interpret, res, g):
    # linear map: cotangent path = depth_to_space (cheap XLA reshape on
    # the cotangent) then the transposed resize kernel
    ih, iw = res
    from renderformer_tpu.ops.s2d_conv import depth_to_space
    return (_apply2d(depth_to_space(g), ih, iw, True, interpret),)


_resize_s2d.defvjp(_resize_s2d_fwd, _resize_s2d_bwd)


def fused_resize_s2d(x, out_hw, interpret: bool = False):
    """[B, H, W, C] → s2d(resize(x, out_hw)) = [B, oh/2, ow/2, 4C].

    Caller must check :func:`fused_resize_s2d_supported` first.
    """
    return _resize_s2d(x, int(out_hw[0]), int(out_hw[1]), interpret)


def fused_resize_s2d_supported(x, out_hw, interpret: bool = False) -> bool:
    if not interpret and jax.devices()[0].platform != 'tpu':
        return False
    if x.ndim != 4:
        return False
    _, ih, iw, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if oh % 2 or ow % 2 or c % 128 != 0 or iw % 8 != 0 or ow % 16 != 0:
        return False
    mh, _ = _axis_matrices(ih, iw, oh, ow, False)
    plan = _plan(mh, ow, iw, c, x.dtype.itemsize)
    if plan is None or plan[0] % 2:
        return False
    # the VJP reuses the plain transposed kernel
    return _supported_dims(oh, ow, ih, iw, c, x.dtype.itemsize, True)


def _supported_dims(ih, iw, oh, ow, c, itemsize, transpose):
    mh, _ = _axis_matrices(ih, iw, oh, ow, transpose)
    return _plan(mh, ow, iw, c, itemsize) is not None


def fused_resize_supported(x, out_hw, interpret: bool = False) -> bool:
    if not interpret and jax.devices()[0].platform != 'tpu':
        return False
    if x.ndim != 4:
        return False
    _, ih, iw, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if c % 128 != 0 or iw % 8 != 0 or ow % 8 != 0:
        return False
    # Both the forward and the transposed (VJP) kernels must fit
    return (_supported_dims(ih, iw, oh, ow, c, x.dtype.itemsize, False)
            and _supported_dims(oh, ow, ih, iw, c, x.dtype.itemsize, True))
