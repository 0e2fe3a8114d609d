"""Recorded end-to-end golden (VERDICT r3 next #8): the fixed-seed
full-size v1-base render through RenderingPipeline must match the
committed recording (tools/record_golden.py) — catches regressions in
the config -> init -> pipeline -> model -> DPT -> HDR chain without the
torch reference.  Slow tier: one full 205M fp32 CPU render."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), 'data',
                      'golden_e2e_v1base.npz')


@pytest.mark.slow
def test_recorded_golden_render():
    assert os.path.exists(GOLDEN), (
        'recording missing — run tools/record_golden.py')
    rec = np.load(GOLDEN)
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.record_golden import render_golden
    img = render_golden(res=int(rec['resolution']))
    ds = img[:, :, ::4, ::4, :].astype(np.float32)

    want = rec['downsampled']
    assert ds.shape == want.shape, (ds.shape, want.shape)
    mse = float(np.mean((ds - want) ** 2))
    peak = float(max(want.max() - want.min(), 1e-9))
    psnr = 10 * np.log10(peak ** 2 / max(mse, 1e-20))
    # 55 dB absorbs fp-summation-order drift from legitimate kernel /
    # fusion changes; real breaks (wrong weights, wrong layout, wrong
    # decode) land tens of dB below
    assert psnr > 55.0, f'recorded-golden PSNR {psnr:.1f} dB'
    # summary stats pin the HDR range
    np.testing.assert_allclose(float(img.mean()), float(rec['mean']),
                               rtol=2e-3)
    np.testing.assert_allclose(float(img.std()), float(rec['std']),
                               rtol=5e-3)
