"""STFT parity vs torch.stft (the reference's loss STFT,
model/loss/stft_loss.py:30-38) and iSTFT round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from fastvocoder_tpu.dsp.stft import hann_window, stft_mag, stft_complex, istft

RESOLUTIONS = [(2048, 240, 1200), (1024, 120, 600), (512, 50, 240)]


def torch_stft_mag(x, fft, hop, win):
    w = torch.hann_window(win)
    z = torch.stft(torch.from_numpy(x), fft, hop, win, w, return_complex=True)
    real, imag = z.real, z.imag
    return torch.sqrt(torch.clamp(real**2 + imag**2, min=1e-7)).numpy()


def test_hann_window_matches_torch():
    for n in (240, 600, 1200):
        ours = np.asarray(hann_window(n))
        theirs = torch.hann_window(n).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("fft,hop,win", RESOLUTIONS)
def test_stft_mag_matches_torch(rng, fft, hop, win):
    x = rng.standard_normal((2, 33600)).astype(np.float32)
    ours = np.asarray(stft_mag(jnp.asarray(x), fft, hop, win))
    theirs = torch_stft_mag(x, fft, hop, win)  # (B, bins, frames)
    theirs = np.transpose(theirs, (0, 2, 1))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_istft_roundtrip(rng):
    fft, hop, win = 1024, 256, 1024
    x = rng.standard_normal((4096,)).astype(np.float32)
    z = stft_complex(jnp.asarray(x), fft, hop, win)
    y = np.asarray(istft(z, fft, hop, win, length=4096))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_stft_frames_count(rng):
    # torch center=True: frames = 1 + T // hop
    x = rng.standard_normal((1, 33600)).astype(np.float32)
    out = stft_mag(jnp.asarray(x), 2048, 240, 1200)
    assert out.shape[1] == 1 + 33600 // 240


def test_frame_signal_grad_matches_plain_gather_on_overrun(rng):
    """When num_frames over-covers the signal, the custom VJP must match the
    plain gather's adjoint: clamped out-of-range reads all hit x[T-1], so
    their cotangent mass belongs to the last sample (not dropped)."""
    import jax

    from fastvocoder_tpu.dsp.stft import frame_signal, _frame_indices

    T, n_fft, hop = 100, 32, 16
    num_frames = 1 + (T - 1) // hop  # (nf-1)*hop + n_fft = 128 > T
    assert (num_frames - 1) * hop + n_fft > T
    x = jnp.asarray(rng.standard_normal(T).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((num_frames, n_fft)).astype(np.float32)
    )

    def via_custom(x):
        return jnp.sum(frame_signal(x, num_frames, n_fft, hop) * w)

    def via_gather(x):
        # clamp explicitly: jax's adjoint of an out-of-range gather DROPS
        # the cotangent (documented OOB-gradient caveat), but the forward
        # clamps — pre-clamped indices give the true gradient of the
        # as-executed computation
        idx = jnp.asarray(
            np.minimum(_frame_indices(num_frames, n_fft, hop), T - 1)
        )
        return jnp.sum(x[idx] * w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(via_custom)(x)),
        np.asarray(jax.grad(via_gather)(x)),
        rtol=1e-5, atol=1e-5,
    )
