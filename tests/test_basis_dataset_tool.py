"""tools/make_basis_dataset.py — the in-framework replacement for the
reference's external ConvTasNet basis/weight pipeline (reference
bin/train.py:298-300, data/dataset.py:90-100)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from make_basis_dataset import main as make_basis_main
from make_basis_dataset import semi_nmf, wav_to_frames


def _ola(frames: np.ndarray, L: int) -> np.ndarray:
    h = L // 2
    out = np.zeros(frames.shape[0] * h + h, np.float32)
    for f in range(frames.shape[0]):
        out[f * h : f * h + L] += frames[f]
    return out


def test_wav_to_frames_is_exact_ola_adjoint():
    rng = np.random.default_rng(0)
    for T in (450, 463, 30):  # multiple of h, ragged, single frame
        wav = rng.standard_normal(T).astype(np.float32)
        frames = wav_to_frames(wav, L=30)
        rec = _ola(frames, 30)[:T]
        np.testing.assert_allclose(rec, wav, rtol=0, atol=1e-6)


def test_semi_nmf_nonnegative_and_converges():
    rng = np.random.default_rng(1)
    # planted factorization: X = relu-weights @ basis
    W0 = np.maximum(rng.standard_normal((400, 8)), 0).astype(np.float32)
    B0 = rng.standard_normal((8, 30)).astype(np.float32)
    X = W0 @ B0
    W, B = semi_nmf(X, C=16, iters=60, seed=0, log=lambda *_: None)
    assert (W >= 0).all()
    err = float(np.sum((X - W @ B) ** 2)) / float(np.sum(X * X))
    assert err < 1e-2  # > 20 dB on a planted rank-8 problem


def test_tool_writes_reference_layout(tmp_path):
    rng = np.random.default_rng(2)
    h, L, C = 15, 30, 32
    paths = []
    for i in range(2):
        wav = rng.standard_normal(40 * h).astype(np.float32)
        p = tmp_path / f"utt{i}.wav.npy"
        np.save(p, wav)
        paths.append(str(p))
    idx = tmp_path / "train.txt"
    idx.write_text("\n".join(paths) + "\n")
    out = tmp_path / "basis"
    make_basis_main([
        "--audio_index", str(idx), "--out_dir", str(out),
        "--L", str(L), "--C", str(C), "--iters", "20",
    ])

    basis = np.load(out / "basis_signal_weight.npy")
    assert basis.shape == (L, C)  # reference layout (L, out_channels)
    for p in paths:
        w = np.load(out / "weight" / os.path.basename(p))
        # reference layout (C, Tw); loader transposes (data/dataset.py)
        assert w.shape == (C, 40 * h // h)
        assert (w >= 0).all()


def test_fitted_targets_decode_through_the_model_layer(tmp_path):
    """The fitted (basis, weights) must reconstruct audio through the
    model's own decode (BasisSignalLayer semantics): weights @ basis^T
    -> 50% OLA."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from fastvocoder_tpu.ops.basis_decode import basis_decode

    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, 45 * 15, endpoint=False)
    wav = (
        0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(t.size)
    ).astype(np.float32)
    frames = wav_to_frames(wav, L=30)
    W, B = semi_nmf(frames, C=64, iters=60, seed=0, log=lambda *_: None)
    rec = np.asarray(
        basis_decode(jnp.asarray(W)[None], jnp.asarray(B.T))
    )[0][: wav.shape[0]]
    snr = 10 * np.log10(np.sum(wav**2) / np.sum((wav - rec) ** 2))
    assert snr > 15.0, snr
