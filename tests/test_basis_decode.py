"""Fused basis-decode correctness: shift-matmul (XLA and Pallas) == the
two-step einsum + overlap-add == the torch reference BasisSignalLayer."""

import numpy as np
import pytest

from tests.conftest import requires_reference, reference_on_path

from fastvocoder_tpu.ops.basis_decode import (
    basis_decode_pallas,
    basis_decode_xla,
)
from fastvocoder_tpu.ops.overlap_add import overlap_and_add


def _two_step(weight, basis):
    import jax.numpy as jnp

    frames = jnp.einsum("bfc,lc->bfl", weight, basis)
    return overlap_and_add(frames, basis.shape[0] // 2)


@pytest.mark.parametrize("B,F,C,L", [(2, 48, 256, 30), (1, 7, 16, 8)])
def test_xla_matches_two_step(rng, B, F, C, L):
    w = rng.standard_normal((B, F, C)).astype(np.float32)
    basis = rng.standard_normal((L, C)).astype(np.float32)
    fused = np.asarray(basis_decode_xla(w, basis))
    ref = np.asarray(_two_step(w, basis))
    assert fused.shape == ref.shape == (B, (F - 1) * (L // 2) + L)
    np.testing.assert_allclose(fused, ref, atol=1e-5, rtol=1e-5)


def test_pallas_matches_xla(rng):
    B, F, C, L = 2, 100, 256, 30
    w = rng.standard_normal((B, F, C)).astype(np.float32)
    basis = rng.standard_normal((L, C)).astype(np.float32)
    fused = np.asarray(basis_decode_xla(w, basis))
    pallas = np.asarray(
        basis_decode_pallas(w, basis, block_rows=64, interpret=True)
    )
    np.testing.assert_allclose(pallas, fused, atol=1e-5, rtol=1e-5)


@requires_reference
def test_matches_reference_basis_signal_layer(rng):
    reference_on_path()
    import torch

    from model.generator.modules import BasisSignalLayer

    L, C = 30, 256
    basis = rng.standard_normal((L, C)).astype(np.float32)
    w = rng.standard_normal((2, 64, C)).astype(np.float32)

    ref_layer = BasisSignalLayer(torch.from_numpy(basis), L=L)
    with torch.no_grad():
        ref_out = ref_layer(torch.from_numpy(w)).numpy()

    ours = np.asarray(basis_decode_xla(w, basis))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


def test_pallas_grad_matches_xla(rng):
    """The training graph can reach the Pallas decode via small-batch `auto`
    routing — its custom VJP must produce the XLA path's exact cotangents
    for both weight and the (frozen-but-differentiated) basis."""
    import jax
    import jax.numpy as jnp

    from fastvocoder_tpu.ops.basis_decode import basis_decode

    B, F, C, L = 2, 24, 64, 30
    w = rng.standard_normal((B, F, C)).astype(np.float32)
    basis = rng.standard_normal((L, C)).astype(np.float32)
    cot = rng.standard_normal((B, (F + 1) * (L // 2))).astype(np.float32)

    def loss(impl):
        def f(wt, bs):
            return jnp.sum(basis_decode(wt, bs, impl=impl) * cot)
        return f

    gw_p, gb_p = jax.grad(loss("pallas"), argnums=(0, 1))(w, basis)
    gw_x, gb_x = jax.grad(loss("xla"), argnums=(0, 1))(w, basis)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x), atol=1e-4)
