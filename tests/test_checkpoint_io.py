"""Checkpoint file interchange: the torch reference must load our saved
files strictly, and we must load files the reference saves."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, reference_on_path

from fastvocoder_tpu.hparams import load_model_config
from fastvocoder_tpu.models.factory import build_discriminator, build_generator
from fastvocoder_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_published,
)

CONF = os.path.join(os.path.dirname(__file__), "..", "conf")


def _init_flax(cfg, rng, basis=None):
    import jax

    gen = build_generator(cfg, basis_signal_weight=basis)
    mel = np.zeros((1, 8, 80), np.float32)
    # jitted init/apply throughout this file: eager dispatch of a full
    # generator is tens of seconds on this single-core box, while compiles
    # land in the persistent cache shared across suite runs
    return gen, jax.jit(gen.init)(jax.random.PRNGKey(0), mel)["params"]


@requires_reference
def test_torch_reference_loads_our_checkpoint(tmp_path, rng):
    """save_checkpoint -> torch.load -> reference load_state_dict(strict)."""
    reference_on_path()
    import jax
    import torch

    from model.discriminator import Discriminator as RefDiscriminator
    from model.generator import HiFiGANGenerator as RefHiFiGAN

    cfg = load_model_config("hifigan", os.path.join(CONF, "hifigan/light.yaml"))
    gen, params = _init_flax(cfg, rng)
    disc = build_discriminator()
    disc_params = jax.jit(disc.init)(
        jax.random.PRNGKey(1), np.zeros((1, 4800), np.float32)
    )["params"]

    path = str(tmp_path / "ckpt.pth.tar")
    save_checkpoint(path, cfg, params, disc_params, step=123)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["step"] == 123

    ref = RefHiFiGAN(
        resblock_kernel_sizes=cfg.raw["resblock_kernel_sizes"],
        upsample_rates=cfg.raw["upsample_rates"],
        upsample_initial_channel=cfg.raw["upsample_initial_channel"],
        resblock_type=cfg.raw["resblock_type"],
        upsample_kernel_sizes=cfg.raw["upsample_kernel_sizes"],
        resblock_dilation_sizes=cfg.raw["resblock_dilation_sizes"],
        transposedconv=cfg.raw["transposedconv"],
        bias=cfg.raw["bias"],
    )
    ref.load_state_dict(ckpt["model"], strict=True)  # must not raise
    RefDiscriminator().load_state_dict(ckpt["discriminator"], strict=True)

    # and the loaded torch model reproduces the flax output
    mel = rng.standard_normal((1, 80, 12)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel)).numpy()
    if ref_out.ndim == 3:
        ref_out = ref_out[:, 0, :]
    ours = np.asarray(
        jax.jit(lambda p, m: gen.apply({"params": p}, m))(
            params, np.transpose(mel, (0, 2, 1))
        )
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


@requires_reference
def test_we_load_reference_saved_checkpoint(tmp_path, rng):
    """A reference-style torch.save dict round-trips into our trainer."""
    reference_on_path()
    import torch

    from model.generator import MelGANGenerator as RefMelGAN

    cfg = load_model_config("melgan", os.path.join(CONF, "melgan/original.yaml"))
    torch.manual_seed(5)
    ref = RefMelGAN(
        in_channels=cfg.raw["in_channels"], out_channels=cfg.raw["out_channels"],
        kernel_size=cfg.raw["kernel_size"], channels=cfg.raw["channels"],
        upsample_scales=cfg.raw["upsample_scales"],
        stack_kernel_size=cfg.raw["stack_kernel_size"], stacks=cfg.raw["stacks"],
        use_weight_norm=cfg.raw["use_weight_norm"],
        use_causal_conv=cfg.raw["use_causal_conv"],
    )
    path = str(tmp_path / "ref_ckpt.pth.tar")
    torch.save({"model": ref.state_dict()}, path)

    import jax

    out = load_checkpoint(path, cfg, with_discriminator=False)
    gen = build_generator(cfg)
    mel = rng.standard_normal((1, 10, 80)).astype(np.float32)
    ours = np.asarray(
        jax.jit(lambda p, m: gen.apply({"params": p}, m))(out["gen_params"], mel)
    )
    with torch.no_grad():
        theirs = ref(torch.from_numpy(np.transpose(mel, (0, 2, 1)))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


@requires_reference
def test_published_artifact_layout(tmp_path, rng):
    """save_published writes {'model','pattern'} and load_checkpoint reads it."""
    reference_on_path()
    import torch

    cfg = load_model_config(
        "basis-melgan", os.path.join(CONF, "basis-melgan/light.yaml")
    )
    basis = rng.standard_normal((30, 256)).astype(np.float32)
    gen, params = _init_flax(cfg, rng, basis=basis)
    pattern = rng.standard_normal((1000,)).astype(np.float32)

    path = str(tmp_path / "published.pth.tar")
    save_published(path, cfg, params, pattern)

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert set(raw.keys()) == {"model", "pattern"}

    out = load_checkpoint(path, cfg, with_discriminator=False)
    np.testing.assert_array_equal(out["pattern"], pattern)
    np.testing.assert_allclose(
        np.asarray(out["gen_params"]["basis_signal"]["basis"]), basis, rtol=1e-6
    )


def test_average_checkpoints(tmp_path):
    """Averaged checkpoint = elementwise mean of model entries, loads like a
    training checkpoint, optimizer state dropped, last ckpt's extras kept."""
    import os
    import sys

    import numpy as np
    import torch

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from average_checkpoints import average_checkpoints, expand_inputs

    d = tmp_path / "run"
    d.mkdir()
    keys = ["melgan.conv.weight_v", "melgan.conv.weight_g"]
    vals = []
    for step in (1000, 2000, 3000):
        model = {
            k: torch.from_numpy(
                np.full((2, 3), float(step + i), np.float32)
            )
            for i, k in enumerate(keys)
        }
        vals.append(model)
        torch.save(
            {"model": model, "optimizer": {"x": 1}, "step": step},
            d / f"checkpoint_{step}.pth.tar",
        )

    paths = expand_inputs([str(d)], last=2)  # newest two: 2000, 3000
    assert [os.path.basename(p) for p in paths] == [
        "checkpoint_2000.pth.tar", "checkpoint_3000.pth.tar",
    ]
    out_path = str(tmp_path / "avg.pth.tar")
    average_checkpoints(paths, out_path)

    avg = torch.load(out_path, map_location="cpu", weights_only=False)
    assert "optimizer" not in avg
    assert avg["step"] == 3000  # last checkpoint's extras
    for i, k in enumerate(keys):
        np.testing.assert_allclose(
            avg["model"][k].numpy(), np.full((2, 3), 2500.0 + i), rtol=1e-6
        )
