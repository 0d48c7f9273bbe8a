"""overlap_and_add parity vs a direct numpy loop (the semantics of the
reference's GCD-subframe scatter version, model/generator/modules.py:34-73)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastvocoder_tpu.ops.overlap_add import overlap_and_add


def np_overlap_add(signal, step):
    *outer, frames, L = signal.shape
    out_size = (frames - 1) * step + L
    out = np.zeros((*outer, out_size), dtype=signal.dtype)
    for i in range(frames):
        out[..., i * step : i * step + L] += signal[..., i, :]
    return out


@pytest.mark.parametrize(
    "frames,L,step",
    [(10, 30, 15), (7, 30, 15), (5, 64, 32), (6, 30, 10), (4, 12, 9), (3, 8, 8), (9, 20, 6)],
)
def test_overlap_add_matches_numpy(rng, frames, L, step):
    x = rng.standard_normal((2, frames, L)).astype(np.float32)
    ref = np_overlap_add(x, step)
    ours = np.asarray(overlap_and_add(jnp.asarray(x), step))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_overlap_add_matches_reference_torch(rng):
    from conftest import has_reference, reference_on_path

    if not has_reference():
        pytest.skip("no reference")
    reference_on_path()
    import torch
    from model.generator.modules import overlap_and_add as torch_ola

    x = rng.standard_normal((3, 16, 30)).astype(np.float32)
    ref = torch_ola(torch.from_numpy(x), 15).numpy()
    ours = np.asarray(overlap_and_add(jnp.asarray(x), 15))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
