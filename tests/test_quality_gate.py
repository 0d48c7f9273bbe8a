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

    import jax

    method = gen.inference if model_name == "basis-melgan" else None
    kw = {"method": method} if method else {}
    ours = jax.jit(lambda p, m: gen.apply({"params": p}, m, **kw))(
        out["gen_params"], mel.T[None]
    )
    our_wav = np.asarray(ours).reshape(-1)

    assert our_wav.shape == ref_wav.shape
    # sample-level agreement
    np.testing.assert_allclose(our_wav, ref_wav, atol=5e-4)
    # the headline gate: MR-STFT spectral distance ~ 0 between frameworks
    sc, mag = multi_resolution_stft_loss(our_wav[None], ref_wav[None])
    dist = float(sc) + float(mag)
    assert dist < 1e-2, f"MR-STFT distance {dist} too large"


# --- bf16 serving quality gate -------------------------------------------
#
# README's serving-mode guarantee: `compute_dtype=jnp.bfloat16` (f32 params,
# bf16 compute) deviates <= max(2e-3, 1% of peak amplitude) from the f32
# waveform.  Measured on random-init models (worst case — trained models
# with TPU fused kernels' f32 accumulate measure tighter, <=8e-4 on the
# serving path): melgan 9.7e-4, hifigan 9.2e-4, mb-hifigan 7.2e-4,
# basis-melgan 3.3e-4, nhv 7.8e-3 @ peak 1.77 (not tanh-bounded).  Tested
# for every generator family below; the published-checkpoint path is
# covered by test_bf16_gate_published_checkpoint.

BF16_ATOL = 2e-3
BF16_RTOL = 0.01  # vs peak |wav|, for non-tanh-bounded outputs (NHV)


def _bf16_bound(wav32: np.ndarray) -> float:
    return max(BF16_ATOL, BF16_RTOL * float(np.max(np.abs(wav32))))

BF16_MODELS = [
    ("melgan", "melgan/original.yaml"),
    ("hifigan", "hifigan/light.yaml"),
    ("multiband-hifigan", "multiband-hifigan/light.yaml"),
    ("basis-melgan", "basis-melgan/light.yaml"),
    ("nhv", "nhv/default.yaml"),
]


def _fwd_for(gen, model_name):
    if model_name in ("basis-melgan", "nhv"):
        return lambda p, m: gen.apply({"params": p}, m, method=gen.inference)
    if model_name == "multiband-hifigan":
        return lambda p, m: gen.apply({"params": p}, m, method=gen.synthesize)
    return lambda p, m: gen.apply({"params": p}, m)


@requires_reference
@pytest.mark.parametrize("model_name,conf", BF16_MODELS)
def test_bf16_quality_gate(model_name, conf, rng):
    """bf16 compute (f32 params) stays within the published deviation bound
    on the reference's fixed test mel, for every model family."""
    import jax
    import jax.numpy as jnp

    cfg = load_model_config(model_name, os.path.join(CONF, conf))
    kw = {}
    if model_name == "basis-melgan":
        kw["basis_signal_weight"] = (
            0.02 * rng.standard_normal((cfg.arch.L, cfg.arch.out_channels))
        ).astype(np.float32)

    gen32 = build_generator(cfg, weight_norm=False, **kw)
    gen16 = build_generator(
        cfg, weight_norm=False, compute_dtype=jnp.bfloat16, **kw
    )

    mel = _load_test_mel().T[None, :128]  # (1, 128, 80) crop: keep CPU cheap
    if model_name == "nhv":
        mel = np.concatenate(
            [mel, np.full(mel.shape[:2] + (1,), 220.0, np.float32)], axis=-1
        )
    init_mel = mel[:, :8]
    params = jax.jit(gen32.init)(jax.random.PRNGKey(0), init_mel)["params"]

    wav32 = np.asarray(
        jax.jit(_fwd_for(gen32, model_name))(params, mel), np.float32
    ).reshape(-1)
    wav16 = np.asarray(
        jax.jit(_fwd_for(gen16, model_name))(params, mel), np.float32
    ).reshape(-1)

    assert wav16.dtype == np.float32 and wav16.shape == wav32.shape
    dev = float(np.max(np.abs(wav16 - wav32)))
    bound = _bf16_bound(wav32)
    assert np.isfinite(wav16).all()
    assert dev <= bound, f"{model_name}: bf16 deviation {dev} > {bound}"


@requires_reference
def test_bf16_gate_published_checkpoint(tmp_path, rng):
    """Same bound through the published-checkpoint path: a reference-style
    torch checkpoint loaded with load_checkpoint, served f32 vs bf16."""
    reference_on_path()
    import jax
    import jax.numpy as jnp
    import torch

    from tests.test_models import _build_reference_model

    torch.manual_seed(7)
    cfg = load_model_config("hifigan", os.path.join(CONF, "hifigan/light.yaml"))
    ref = _build_reference_model("hifigan", cfg.raw, None)
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"model": ref.state_dict()}, path)
    out = load_checkpoint(path, cfg, with_discriminator=False)

    mel = _load_test_mel().T[None, :128]
    gen32 = build_generator(cfg)
    gen16 = build_generator(cfg, compute_dtype=jnp.bfloat16)
    wav32 = np.asarray(
        jax.jit(lambda p, m: gen32.apply({"params": p}, m))(
            out["gen_params"], mel
        ),
        np.float32,
    ).reshape(-1)
    wav16 = np.asarray(
        jax.jit(lambda p, m: gen16.apply({"params": p}, m))(
            out["gen_params"], mel
        ),
        np.float32,
    ).reshape(-1)
    dev = float(np.max(np.abs(wav16 - wav32)))
    bound = _bf16_bound(wav32)
    assert dev <= bound, f"published-ckpt bf16 deviation {dev} > {bound}"
