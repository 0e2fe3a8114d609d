"""Batched pair-window Pallas swin kernel (ops/swin_attention.py) vs the
XLA windowed-SDPA path — values and gradients, shifted and unshifted
(VERDICT r3 next #2).  Runs in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderformer_tpu.nn.attention import SwinSelfAttention
from renderformer_tpu.ops.swin_attention import (
    swin_kernel_applicable, swin_window_attention)


@pytest.mark.parametrize('shift', [0, 4])
def test_module_kernel_matches_xla(shift):
    """SwinSelfAttention with impl='flash' (kernel) == impl='xla'."""
    dim, heads, ws = 256, 2, 8           # head_dim 128 — kernel-applicable
    h = w = 16                            # 4 windows -> 2 pairs
    b = 2
    mod = SwinSelfAttention(dim=dim, num_heads=heads, window_size=ws,
                            shift_size=shift, qk_norm=True)
    params = mod.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h * w, dim)), jnp.float32)

    out_x = mod(params, x, impl='xla', grid=(h, w))
    out_k = mod(params, x, impl='flash', grid=(h, w))
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=2e-4, atol=2e-5)

    # gradients through the custom VJP
    gx = jax.grad(lambda p: jnp.sum(mod(p, x, impl='xla', grid=(h, w)) ** 2))(params)
    gk = jax.grad(lambda p: jnp.sum(mod(p, x, impl='flash', grid=(h, w)) ** 2))(params)
    from jax.flatten_util import ravel_pytree
    flat_x, _ = ravel_pytree(gx)
    flat_k, _ = ravel_pytree(gk)
    np.testing.assert_allclose(np.asarray(flat_k), np.asarray(flat_x),
                               rtol=2e-3, atol=2e-4)


def test_applicability_gate():
    # 64-dim heads: not applicable (needs 128)
    assert not swin_kernel_applicable(8, 64, 256, 4, 4)
    # odd window count: not applicable
    assert not swin_kernel_applicable(3, 64, 256, 2, 3)
    # 4x4 windows (16 tokens): not applicable
    assert not swin_kernel_applicable(8, 16, 256, 2, 4)
    # swin-large at 512^2: applicable
    assert swin_kernel_applicable(8 * 64, 64, 1024, 8, 64)


def test_pair_independence():
    """Tokens in window 2i must not attend to window 2i+1 (the pair
    packing is masked block-diagonal)."""
    rng = np.random.default_rng(1)
    nW, s, c = 2, 64, 128
    q = jnp.asarray(rng.normal(size=(nW, s, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(nW, s, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(nW, s, c)), jnp.float32)
    out = swin_window_attention(q, k, v, n_windows=nW)
    # perturb window 1's keys/values: window 0's output must not change
    k2 = k.at[1].set(k[1] + 10.0)
    v2 = v.at[1].set(v[1] - 5.0)
    out2 = swin_window_attention(q, k2, v2, n_windows=nW)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(np.asarray(out[1]), np.asarray(out2[1]))
