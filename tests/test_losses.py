"""Loss parity vs the torch reference (model/loss/*, bin/train.py inline GAN
losses)."""

import numpy as np
import pytest

from tests.conftest import requires_reference, reference_on_path

from fastvocoder_tpu.losses import (
    adversarial_loss,
    discriminator_loss,
    feature_map_loss,
    multi_resolution_stft_loss,
    reconstruction_loss,
)
from fastvocoder_tpu.ops.pqmf import PQMF


@requires_reference
def test_mr_stft_loss_parity(rng):
    reference_on_path()
    import torch
    from model.loss.stft_loss import MultiResolutionSTFTLoss

    x = rng.standard_normal((2, 9600)).astype(np.float32) * 0.3
    y = rng.standard_normal((2, 9600)).astype(np.float32) * 0.3

    ref = MultiResolutionSTFTLoss()
    sc_t, mag_t = ref(torch.from_numpy(x), torch.from_numpy(y))
    sc_j, mag_j = multi_resolution_stft_loss(x, y)

    np.testing.assert_allclose(float(sc_j), sc_t.item(), rtol=2e-4)
    np.testing.assert_allclose(float(mag_j), mag_t.item(), rtol=2e-4)


@requires_reference
def test_reconstruction_loss_fullband_parity(rng):
    reference_on_path()
    import torch
    from model.loss.loss import Loss

    est = rng.standard_normal((2, 9600)).astype(np.float32) * 0.3
    wav = rng.standard_normal((2, 9600)).astype(np.float32) * 0.3
    ew = rng.standard_normal((2, 40, 16)).astype(np.float32)
    w = rng.standard_normal((2, 40, 16)).astype(np.float32)

    ref = Loss()
    stft_t, weight_t = ref(
        torch.from_numpy(est), torch.from_numpy(wav),
        est_weight=torch.from_numpy(ew), weight=torch.from_numpy(w),
    )
    stft_j, weight_j = reconstruction_loss(est, wav, est_weight=ew, weight=w)

    np.testing.assert_allclose(float(stft_j), stft_t.item(), rtol=2e-4)
    np.testing.assert_allclose(float(weight_j), weight_t.item(), rtol=1e-5)


@requires_reference
def test_reconstruction_loss_multiband_parity(rng):
    reference_on_path()
    import torch
    from model.loss.loss import Loss
    from model.generator.pqmf import PQMF as RefPQMF

    est_sub = rng.standard_normal((2, 2400, 4)).astype(np.float32) * 0.3
    wav = rng.standard_normal((2, 9600)).astype(np.float32) * 0.3

    ref = Loss()
    stft_t, _ = ref(
        torch.from_numpy(np.ascontiguousarray(np.transpose(est_sub, (0, 2, 1)))),
        torch.from_numpy(wav),
        pqmf=RefPQMF(),
    )
    stft_j, weight_j = reconstruction_loss(est_sub, wav, pqmf=PQMF())

    assert weight_j is None
    np.testing.assert_allclose(float(stft_j), stft_t.item(), rtol=5e-4)


def _fake_disc_out(rng, scales=4, layers=5):
    return [
        [rng.standard_normal((2, 30 - 3 * j, 8)).astype(np.float32) for j in range(layers)]
        for _ in range(scales)
    ]


@requires_reference
def test_gan_loss_formulas_parity(rng):
    """The GAN loss functions == the reference's inline math
    (bin/train.py:100-118, 157-168) on identical feature lists."""
    reference_on_path()
    import torch
    import torch.nn as nn

    est_p = _fake_disc_out(rng)
    real_p = _fake_disc_out(rng)

    tp = [[torch.from_numpy(a) for a in feats] for feats in est_p]
    rp = [[torch.from_numpy(a) for a in feats] for feats in real_p]

    adv_t = sum(
        nn.MSELoss()(f[-1], torch.ones_like(f[-1])) for f in tp
    ) / float(len(tp))
    fm_t = sum(
        nn.L1Loss()(tp[i][j], rp[i][j])
        for i in range(len(tp))
        for j in range(len(tp[i]) - 1)
    ) / (float(len(tp)) * float(len(tp[0]) - 1))
    real_t = sum(
        nn.MSELoss()(f[-1], torch.ones_like(f[-1])) for f in rp
    ) / float(len(rp))
    fake_t = sum(
        nn.MSELoss()(f[-1], torch.zeros_like(f[-1])) for f in tp
    ) / float(len(tp))

    np.testing.assert_allclose(float(adversarial_loss(est_p)), adv_t.item(), rtol=1e-5)
    np.testing.assert_allclose(
        float(feature_map_loss(est_p, real_p)), fm_t.item(), rtol=1e-5
    )
    rl, fl = discriminator_loss(real_p, est_p)
    np.testing.assert_allclose(float(rl), real_t.item(), rtol=1e-5)
    np.testing.assert_allclose(float(fl), fake_t.item(), rtol=1e-5)
