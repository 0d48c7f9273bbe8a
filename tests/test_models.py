"""Generator + discriminator parity vs the torch reference.

For every shipped config: build the reference torch model, convert its
random-init state_dict through `train.checkpoint.torch_to_flax`, run both on
the same input, and compare.  This validates the flax architectures, the
torch padding parity of ops/conv.py, and the checkpoint key maps in one shot.
"""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, reference_on_path

from fastvocoder_tpu.hparams import load_model_config
from fastvocoder_tpu.models.factory import build_discriminator, build_generator
from fastvocoder_tpu.train.checkpoint import (
    discriminator_key_map,
    flax_to_torch,
    fuse_weight_norm,
    generator_key_map,
    torch_to_flax,
)

CONF = os.path.join(os.path.dirname(__file__), "..", "conf")

CASES = [
    ("melgan", "melgan/original.yaml"),
    ("hifigan", "hifigan/light.yaml"),
    ("multiband-hifigan", "multiband-hifigan/light.yaml"),
    ("basis-melgan", "basis-melgan/light.yaml"),
]


def _build_reference_model(model_name, raw, basis=None):
    import torch

    from model.generator import (  # noqa: F401
        BasisMelGANGenerator,
        HiFiGANGenerator,
        MelGANGenerator,
        MultiBandHiFiGANGenerator,
    )

    # same construction switch as reference bin/train.py:269-313
    if model_name == "melgan":
        return MelGANGenerator(
            in_channels=raw["in_channels"], out_channels=raw["out_channels"],
            kernel_size=raw["kernel_size"], channels=raw["channels"],
            upsample_scales=raw["upsample_scales"],
            stack_kernel_size=raw["stack_kernel_size"], stacks=raw["stacks"],
            use_weight_norm=raw["use_weight_norm"],
            use_causal_conv=raw["use_causal_conv"],
        )
    if model_name == "hifigan":
        return HiFiGANGenerator(
            resblock_kernel_sizes=raw["resblock_kernel_sizes"],
            upsample_rates=raw["upsample_rates"],
            upsample_initial_channel=raw["upsample_initial_channel"],
            resblock_type=raw["resblock_type"],
            upsample_kernel_sizes=raw["upsample_kernel_sizes"],
            resblock_dilation_sizes=raw["resblock_dilation_sizes"],
            transposedconv=raw["transposedconv"], bias=raw["bias"],
        )
    if model_name == "multiband-hifigan":
        return MultiBandHiFiGANGenerator(
            resblock_kernel_sizes=raw["resblock_kernel_sizes"],
            upsample_rates=raw["upsample_rates"],
            upsample_initial_channel=raw["upsample_initial_channel"],
            resblock_type=raw["resblock_type"],
            upsample_kernel_sizes=raw["upsample_kernel_sizes"],
            resblock_dilation_sizes=raw["resblock_dilation_sizes"],
            transposedconv=raw["transposedconv"], bias=raw["bias"],
        )
    if model_name == "basis-melgan":
        import torch as _t

        return BasisMelGANGenerator(
            basis_signal_weight=_t.from_numpy(basis),
            L=raw["L"], in_channels=raw["in_channels"],
            out_channels=raw["out_channels"], kernel_size=raw["kernel_size"],
            channels=raw["channels"], upsample_scales=raw["upsample_scales"],
            stack_kernel_size=raw["stack_kernel_size"], stacks=raw["stacks"],
            use_weight_norm=raw["use_weight_norm"],
            use_causal_conv=raw["use_causal_conv"],
            transposedconv=raw["transposedconv"],
        )
    raise ValueError(model_name)


@requires_reference
@pytest.mark.parametrize("model_name,conf", CASES)
def test_generator_parity(model_name, conf, rng):
    reference_on_path()
    import torch

    torch.manual_seed(0)
    cfg = load_model_config(model_name, os.path.join(CONF, conf))
    basis = (
        rng.standard_normal((cfg.arch.L, cfg.arch.out_channels)).astype(np.float32)
        if model_name == "basis-melgan"
        else None
    )

    ref = _build_reference_model(model_name, cfg.raw, basis)
    ref.eval()
    params = torch_to_flax(ref.state_dict(), generator_key_map(cfg))

    gen = build_generator(cfg, basis_signal_weight=basis)

    B, T = 2, 24
    mel = rng.standard_normal((B, 80, T)).astype(np.float32)
    with torch.no_grad():
        if model_name == "basis-melgan":
            ref_out, ref_w = ref(torch.from_numpy(mel))
            ref_out, ref_w = ref_out.numpy(), ref_w.numpy()
        else:
            ref_out = ref(torch.from_numpy(mel)).numpy()

    import jax

    # jitted applies file-wide: eager dispatch of a full generator costs
    # tens of seconds on this single-core box; compiles land in the
    # persistent cache shared across suite runs (VERDICT r03 item 6)
    mel_ntc = np.transpose(mel, (0, 2, 1))
    apply = jax.jit(lambda p, m: gen.apply({"params": p}, m))
    if model_name == "basis-melgan":
        out, w = apply(params, mel_ntc)
        np.testing.assert_allclose(np.asarray(w), ref_w, atol=2e-4, rtol=1e-3)
    else:
        out = apply(params, mel_ntc)
    out = np.asarray(out)

    if model_name == "multiband-hifigan":
        ref_out = np.transpose(ref_out, (0, 2, 1))  # (B,4,T)->(B,T,4)
    elif ref_out.ndim == 3 and ref_out.shape[1] == 1:
        ref_out = ref_out[:, 0, :]
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


@requires_reference
@pytest.mark.parametrize("model_name,conf", CASES)
def test_weight_norm_fusion_matches(model_name, conf, rng):
    """fuse_weight_norm == the reference's remove_weight_norm()."""
    reference_on_path()
    import torch

    torch.manual_seed(1)
    cfg = load_model_config(model_name, os.path.join(CONF, conf))
    basis = (
        rng.standard_normal((cfg.arch.L, cfg.arch.out_channels)).astype(np.float32)
        if model_name == "basis-melgan"
        else None
    )
    ref = _build_reference_model(model_name, cfg.raw, basis)
    ref.eval()
    params = torch_to_flax(ref.state_dict(), generator_key_map(cfg))
    fused = fuse_weight_norm(params)

    gen_wn = build_generator(cfg, basis_signal_weight=basis)
    gen_fused = build_generator(cfg, basis_signal_weight=basis, weight_norm=False)

    import jax

    B, T = 1, 16
    mel = rng.standard_normal((B, T, 80)).astype(np.float32)
    a = jax.jit(lambda p, m: gen_wn.apply({"params": p}, m))(params, mel)
    b = jax.jit(lambda p, m: gen_fused.apply({"params": p}, m))(fused, mel)
    if model_name == "basis-melgan":
        a, b = a[0], b[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@requires_reference
def test_roundtrip_flax_to_torch(rng):
    """flax->torch->flax is the identity on the param tree."""
    reference_on_path()
    import torch

    torch.manual_seed(2)
    cfg = load_model_config("hifigan", os.path.join(CONF, "hifigan/light.yaml"))
    ref = _build_reference_model("hifigan", cfg.raw)
    km = generator_key_map(cfg)
    params = torch_to_flax(ref.state_dict(), km)
    sd = flax_to_torch(params, km)
    params2 = torch_to_flax(sd, km)

    import jax

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(params2)[0],
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_reference
def test_discriminator_parity(rng):
    reference_on_path()
    import torch

    from model.discriminator import Discriminator as RefDiscriminator

    torch.manual_seed(3)
    ref = RefDiscriminator()
    ref.eval()
    params = torch_to_flax(ref.state_dict(), discriminator_key_map())

    import jax

    disc = build_discriminator()

    B, T = 2, 4800
    wav = (0.1 * rng.standard_normal((B, T))).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(wav).unsqueeze(1))

    outs = jax.jit(lambda p, w: disc.apply({"params": p}, w))(params, wav)

    assert len(outs) == len(ref_outs) == 6  # 3 MSD scales + 3 MFD resolutions
    for scale_i, (ours, theirs) in enumerate(zip(outs, ref_outs)):
        assert len(ours) == len(theirs)
        for layer_i, (o, t) in enumerate(zip(ours, theirs)):
            t = t.numpy()
            o = np.asarray(o)
            if t.ndim == 3:
                t = np.transpose(t, (0, 2, 1))
            np.testing.assert_allclose(
                o, t, atol=5e-4, rtol=1e-3,
                err_msg=f"scale {scale_i} layer {layer_i}",
            )


@requires_reference
def test_hifigan_nearest_interp_upsample_parity(rng):
    """transposedconv=False exercises the anti-checkerboard UpsampleLayer
    (reference hifigan.py:30-44, modules.py:135-177)."""
    reference_on_path()
    import torch

    torch.manual_seed(11)
    cfg = load_model_config("hifigan", os.path.join(CONF, "hifigan/light.yaml"))
    raw = dict(cfg.raw, transposedconv=False)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, transposedconv=False), raw=raw
    )
    ref = _build_reference_model("hifigan", raw)
    ref.eval()
    params = torch_to_flax(ref.state_dict(), generator_key_map(cfg))
    gen = build_generator(cfg)

    import jax

    mel = rng.standard_normal((1, 80, 10)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel)).numpy()
    if ref_out.ndim == 3:
        ref_out = ref_out[:, 0, :]
    out = np.asarray(
        jax.jit(lambda p, m: gen.apply({"params": p}, m))(
            params, np.transpose(mel, (0, 2, 1))
        )
    )
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


@requires_reference
def test_melgan_causal_parity(rng):
    """use_causal_conv=True exercises CausalConv1d stacks
    (reference modules.py:273-317, 360-367)."""
    reference_on_path()
    import torch

    torch.manual_seed(12)
    cfg = load_model_config("melgan", os.path.join(CONF, "melgan/original.yaml"))
    raw = dict(cfg.raw, use_causal_conv=True,
               channels=[64, 32, 16, 16, 16])  # small for test speed
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        arch=dataclasses.replace(
            cfg.arch, use_causal_conv=True, channels=(64, 32, 16, 16, 16)
        ),
        raw=raw,
    )
    ref = _build_reference_model("melgan", raw)
    ref.eval()
    params = torch_to_flax(ref.state_dict(), generator_key_map(cfg))
    gen = build_generator(cfg)

    import jax

    mel = rng.standard_normal((1, 80, 12)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel)).numpy()
    if ref_out.ndim == 3:
        ref_out = ref_out[:, 0, :]
    out = np.asarray(
        jax.jit(lambda p, m: gen.apply({"params": p}, m))(
            params, np.transpose(mel, (0, 2, 1))
        )
    )
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)
