"""PQMF parity vs the reference torch implementation + reconstruction SNR."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastvocoder_tpu.ops.pqmf import PQMF, design_prototype_filter
from conftest import has_reference, reference_on_path


def test_prototype_filter_matches_reference():
    if not has_reference():
        pytest.skip("no reference")
    reference_on_path()
    from model.generator.pqmf import design_prototype_filter as ref_design

    ours = design_prototype_filter()
    theirs = ref_design()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_analysis_synthesis_match_reference(rng):
    if not has_reference():
        pytest.skip("no reference")
    reference_on_path()
    import torch
    from model.generator.pqmf import PQMF as TorchPQMF

    x = rng.standard_normal((2, 1, 960)).astype(np.float32)
    tp = TorchPQMF()
    sub_ref = tp.analysis(torch.from_numpy(x)).numpy()          # (B, 4, T/4)
    rec_ref = tp.synthesis(torch.from_numpy(sub_ref)).numpy()   # (B, 1, T)

    p = PQMF()
    sub = p.analysis(jnp.asarray(np.transpose(x, (0, 2, 1))))   # (B, T/4, 4)
    np.testing.assert_allclose(
        np.asarray(sub), np.transpose(sub_ref, (0, 2, 1)), rtol=1e-4, atol=1e-4
    )
    rec = p.synthesis(sub)
    np.testing.assert_allclose(
        np.asarray(rec), np.transpose(rec_ref, (0, 2, 1)), rtol=1e-4, atol=2e-4
    )


def test_near_perfect_reconstruction(rng):
    # the centered padding in analysis+synthesis compensates the filterbank
    # group delay, so the round-trip is delay-free at ~65 dB SNR
    p = PQMF()
    t = np.arange(9600)
    x = np.sin(2 * np.pi * 220 * t / 24000) * 0.5
    x = (x + 0.1 * rng.standard_normal(t.shape)).astype(np.float32)[None, :, None]
    rec = np.asarray(p.synthesis(p.analysis(jnp.asarray(x))))[0, :, 0]
    a = x[0, :, 0][1000:-1000]
    b = rec[1000:-1000]
    snr = 10 * np.log10(np.sum(a**2) / np.sum((a - b) ** 2))
    assert snr > 50.0, f"PQMF reconstruction SNR too low: {snr:.1f} dB"
