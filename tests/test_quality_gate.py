"""Spectral-parity quality gate (BASELINE.md quality target).

Synthesizes the reference's fixed test mel (`resource/test.mel.npy`, (80, 585))
through a converted reference-style checkpoint and asserts the MR-STFT
distance between our waveform and the torch reference's own output is ~0 —
i.e. a user switching frameworks gets spectrally identical audio from the
same checkpoint (reference bin/synthesize.py:74-80 synthesis semantics).
"""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE, requires_reference, reference_on_path

from fastvocoder_tpu.hparams import load_model_config
from fastvocoder_tpu.losses.stft_loss import multi_resolution_stft_loss
from fastvocoder_tpu.models.factory import build_generator
from fastvocoder_tpu.train.checkpoint import load_checkpoint

CONF = os.path.join(os.path.dirname(__file__), "..", "conf")
TEST_MEL = os.path.join(REFERENCE, "resource", "test.mel.npy")


def _load_test_mel() -> np.ndarray:
    return np.load(TEST_MEL).astype(np.float32)  # (80, 585)


@requires_reference
@pytest.mark.parametrize(
    "model_name,conf",
    [("basis-melgan", "basis-melgan/light.yaml"), ("hifigan", "hifigan/light.yaml")],
)
def test_spectral_parity_on_reference_mel(model_name, conf, tmp_path, rng):
    reference_on_path()
    import torch

    from tests.test_models import _build_reference_model

    torch.manual_seed(7)
    cfg = load_model_config(model_name, os.path.join(CONF, conf))
    basis = (
        (0.02 * rng.standard_normal((cfg.arch.L, cfg.arch.out_channels))).astype(
            np.float32
        )
        if model_name == "basis-melgan"
        else None
    )
    ref = _build_reference_model(model_name, cfg.raw, basis)
    ref.eval()

    # reference-style training checkpoint -> our loader
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"model": ref.state_dict()}, path)
    out = load_checkpoint(path, cfg, with_discriminator=False)
    gen = build_generator(cfg, basis_signal_weight=basis)

    mel = _load_test_mel()  # (80, 585)
    with torch.no_grad():
        ref_wav = ref.inference(torch.from_numpy(mel.T)).numpy().reshape(-1)

    method = gen.inference if model_name == "basis-melgan" else None
    ours = gen.apply(
        {"params": out["gen_params"]},
        mel.T[None],
        **({"method": method} if method else {}),
    )
    our_wav = np.asarray(ours).reshape(-1)

    assert our_wav.shape == ref_wav.shape
    # sample-level agreement
    np.testing.assert_allclose(our_wav, ref_wav, atol=5e-4)
    # the headline gate: MR-STFT spectral distance ~ 0 between frameworks
    sc, mag = multi_resolution_stft_loss(our_wav[None], ref_wav[None])
    dist = float(sc) + float(mag)
    assert dist < 1e-2, f"MR-STFT distance {dist} too large"
