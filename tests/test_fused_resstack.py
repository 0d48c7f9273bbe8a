"""Fused residual-stack chain (ops/fused_resstack.py) — parity vs the
sequential ResidualStack module path, in Pallas interpreter mode.

Tolerance note: isolated rows can differ by ~3e-5 where a pre-activation
sits within f32-reassociation distance of the leaky-relu kink (the branch
flips on a near-zero value); everywhere else the chain is exact, including
the stitched sequence edges (reflect-pad semantics are per-stack and are
computed by the standard chain on 4M slices).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastvocoder_tpu.models.layers import ResidualStack
from fastvocoder_tpu.ops.fused_resstack import (
    fused_residual_stacks,
    stack_margin,
)


def _chain(C, x, seed0=0):
    mods, ps, ws = [], [], []
    for j in range(3):
        rs = ResidualStack(
            channels=C, kernel_size=3, dilation=3 ** j, weight_norm=False
        )
        p = rs.init(jax.random.PRNGKey(seed0 + j), x)["params"]
        mods.append(rs)
        ps.append(p)
        ws.append(
            (p["conv_dilated"]["kernel"], p["conv_dilated"]["bias"], 3 ** j,
             p["conv_1x1"]["kernel"], p["conv_1x1"]["bias"],
             p["skip"]["kernel"], p["skip"]["bias"])
        )
    ref = x
    for rs, p in zip(mods, ps):
        ref = rs.apply({"params": p}, ref)
    return ref, ws


@pytest.mark.parametrize("C,T", [(128, 200), (256, 97), (32, 1024), (64, 512)])
def test_fused_residual_stacks_matches_modules(C, T):
    rng = np.random.default_rng(C + T)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32) * 0.3)
    ref, ws = _chain(C, x)
    got = fused_residual_stacks(x, ws, tile_q=32, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)
    # the bulk of rows must be bit-benign (only kink-adjacent rows may move)
    row_err = np.max(np.abs(np.asarray(got) - np.asarray(ref)), axis=(0, 2))
    assert (row_err < 1e-6).mean() > 0.9


def test_stack_margin():
    assert stack_margin(3, 1) == 1
    assert stack_margin(3, 9) == 9
    assert stack_margin(7, 2) == 6


def test_generators_fused_stacks_parity(monkeypatch):
    """basis-melgan and melgan produce the same waveforms with the fused
    stack path forced (interpret) as with the standard modules."""
    import os

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator

    root = os.path.join(os.path.dirname(__file__), "..")
    rng = np.random.default_rng(5)
    mel = np.clip(
        0.5 + 0.25 * rng.standard_normal((1, 20, 80)), 0, 1
    ).astype(np.float32)

    cfg = load_model_config(
        "basis-melgan", os.path.join(root, "conf", "basis-melgan", "light.yaml")
    )
    basis = (
        0.02 * rng.standard_normal((cfg.arch.L, cfg.arch.out_channels))
    ).astype(np.float32)
    gen = build_generator(cfg, weight_norm=False, basis_signal_weight=basis)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:, :4])["params"]
    monkeypatch.setenv("FASTVOCODER_FUSED_STACKS", "0")
    ref = np.asarray(gen.apply({"params": params}, mel, method=gen.inference))
    monkeypatch.setenv("FASTVOCODER_FUSED_STACKS", "interpret")
    got = np.asarray(gen.apply({"params": params}, mel, method=gen.inference))
    np.testing.assert_allclose(got, ref, atol=2e-4)

    cfg = load_model_config(
        "melgan", os.path.join(root, "conf", "melgan", "original.yaml")
    )
    gen = build_generator(cfg, weight_norm=False)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:, :4])["params"]
    monkeypatch.setenv("FASTVOCODER_FUSED_STACKS", "0")
    ref = np.asarray(gen.apply({"params": params}, mel))
    monkeypatch.setenv("FASTVOCODER_FUSED_STACKS", "interpret")
    got = np.asarray(gen.apply({"params": params}, mel))
    np.testing.assert_allclose(got, ref, atol=2e-4)
