"""Train-step behavior tests: loss descent, phase semantics, basis freezing,
and data-parallel execution on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvocoder_tpu.hparams import (
    BasisMelGANConfig,
    HP,
    MelGANConfig,
    ModelConfig,
    TINY_DISC,
)
from fastvocoder_tpu.parallel import (
    compile_train_step_no_weight,
    make_mesh,
    replicate_state,
    shard_batch,
)
from fastvocoder_tpu.train.trainer import make_trainer

FIXED = 10  # tiny crop: wav = 10 * 240 = 2400 samples
TINY_HP = HP.replace(fixed_length=FIXED)


def tiny_melgan_cfg(lambda_stft=1.0):
    arch = MelGANConfig(channels=(8, 8, 8, 8, 8))
    return ModelConfig(model_name="melgan", arch=arch, lambda_stft=lambda_stft)


def tiny_basis_cfg():
    arch = BasisMelGANConfig(out_channels=16, channels=(16, 16, 16))
    return ModelConfig(
        model_name="basis-melgan", arch=arch, lambda_stft=1.0,
        use_feature_map_loss=False,
    )


def make_batch(rng, B=2, fixed=FIXED):
    mel = rng.standard_normal((B, fixed, 80)).astype(np.float32)
    t = np.arange(fixed * 240, dtype=np.float32)
    wav = np.stack(
        [0.3 * np.sin(2 * np.pi * 220 * (i + 1) * t / 24000) for i in range(B)]
    ).astype(np.float32)
    return mel, wav


def test_pre_adv_step_descends(rng):
    trainer = make_trainer(tiny_melgan_cfg(), hp=TINY_HP, disc_cfg=TINY_DISC)
    state = trainer.init_state(jax.random.PRNGKey(0))
    mel, wav = make_batch(rng)
    step = jax.jit(trainer.pre_adv_step)
    losses = []
    for _ in range(5):
        state, metrics = step(state, mel, wav)
        losses.append(float(metrics["stft_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_gan_step_updates_both_and_is_finite(rng):
    trainer = make_trainer(tiny_melgan_cfg(), hp=TINY_HP, disc_cfg=TINY_DISC)
    state = trainer.init_state(jax.random.PRNGKey(0))
    mel, wav = make_batch(rng)
    g0 = jax.tree_util.tree_leaves(state.gen_params)[0].copy()
    d0 = jax.tree_util.tree_leaves(state.disc_params)[0].copy()

    state, metrics = jax.jit(trainer.gan_step)(state, mel, wav)

    for k in ("stft_loss", "adversarial_loss", "feature_map_loss",
              "discriminator_loss", "total_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert not np.allclose(jax.tree_util.tree_leaves(state.gen_params)[0], g0)
    assert not np.allclose(jax.tree_util.tree_leaves(state.disc_params)[0], d0)


def test_basis_melgan_step_freezes_basis(rng):
    basis = rng.standard_normal((30, 16)).astype(np.float32)
    trainer = make_trainer(
        tiny_basis_cfg(), hp=TINY_HP, basis_signal_weight=basis,
        disc_cfg=TINY_DISC,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    mel, wav = make_batch(rng)
    weight = 0.1 * np.abs(rng.standard_normal((2, FIXED * 16, 16))).astype(np.float32)

    step = jax.jit(trainer.pre_adv_step)
    for _ in range(3):
        state, metrics = step(state, mel, wav, weight)

    assert "weight_loss" in metrics and np.isfinite(float(metrics["weight_loss"]))
    # basis layer frozen (reference bin/train.py:329-331)
    np.testing.assert_array_equal(
        np.asarray(state.gen_params["basis_signal"]["basis"]), basis
    )
    # trunk did train
    assert not np.allclose(
        np.asarray(state.gen_params["conv_pre"]["kernel"]),
        np.asarray(trainer.init_state(jax.random.PRNGKey(0)).gen_params["conv_pre"]["kernel"]),
    )


def test_scheduler_matches_torch_formula():
    from fastvocoder_tpu.train.trainer import torch_cosine_annealing

    s = torch_cosine_annealing(1e-4, t_max=2500)
    assert np.isclose(float(s(0)), 1e-4)
    assert np.isclose(float(s(2500)), 1e-5)
    assert np.isclose(float(s(1250)), (1e-4 + 1e-5) / 2)


def test_data_parallel_step_on_mesh(rng):
    """8-way DP on the virtual CPU mesh: replicated state, sharded batch."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    trainer = make_trainer(tiny_melgan_cfg(), hp=TINY_HP, disc_cfg=TINY_DISC)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)

    mel, wav = make_batch(rng, B=8)
    batch = shard_batch({"mel": mel, "wav": wav}, mesh)

    step = compile_train_step_no_weight(trainer.pre_adv_step, mesh)
    state, metrics = step(state, batch["mel"], batch["wav"])
    assert np.isfinite(float(metrics["stft_loss"]))

    # DP-equivalence: the sharded step == the single-device step on the
    # same global batch
    state1 = trainer.init_state(jax.random.PRNGKey(0))
    state1, m1 = jax.jit(trainer.pre_adv_step)(state1, mel, wav)
    np.testing.assert_allclose(
        float(m1["stft_loss"]), float(metrics["stft_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state1.gen_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]),
        atol=1e-6,
    )


@pytest.mark.slow
def test_data_parallel_step_with_fused_train_kernels(monkeypatch, rng):
    # slow tier: fused-train x data-parallel composition — its constituents
    # are each gated in the default tier (test_data_parallel_step_on_mesh,
    # test_fused_mrf.py::test_hifigan_fused_train_step_matches_standard);
    # interpret-mode Pallas under an 8-device mesh makes it ~2.5 min.
    """8-way DP composes with the fused-train Pallas custom-VJP path: the
    sharded step equals the single-device step with the same kernels on
    (the batch dim is the leading pallas grid dim in the forward AND the
    backward, so XLA partitions both without replication)."""
    from fastvocoder_tpu.hparams import HiFiGANConfig

    monkeypatch.setenv("FASTVOCODER_FUSED_TRAIN", "interpret")
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    hp = HP.replace(fixed_length=8)
    cfg = ModelConfig(
        model_name="hifigan",
        arch=HiFiGANConfig(upsample_initial_channel=64),
        lambda_stft=1.0,
    )
    trainer = make_trainer(cfg, hp=hp, disc_cfg=TINY_DISC)
    mel, wav = make_batch(rng, B=8, fixed=8)

    state = trainer.init_state(jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    batch = shard_batch({"mel": mel, "wav": wav}, mesh)
    step = compile_train_step_no_weight(trainer.pre_adv_step, mesh)
    state, metrics = step(state, batch["mel"], batch["wav"])

    state1 = trainer.init_state(jax.random.PRNGKey(0))
    state1, m1 = jax.jit(trainer.pre_adv_step)(state1, mel, wav)
    np.testing.assert_allclose(
        float(m1["stft_loss"]), float(metrics["stft_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state1.gen_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]),
        atol=1e-6,
    )


def test_bf16_mixed_precision_step(rng):
    """compute_dtype=bfloat16: f32 master params, bf16 conv compute, finite
    f32 losses (the reference's amp-O1 analog)."""
    import jax.numpy as jnp

    trainer = make_trainer(tiny_melgan_cfg(), hp=TINY_HP, compute_dtype=jnp.bfloat16,
                           disc_cfg=TINY_DISC)
    state = trainer.init_state(jax.random.PRNGKey(0))
    # master params stay f32
    assert jax.tree_util.tree_leaves(state.gen_params)[0].dtype == jnp.float32
    mel, wav = make_batch(rng)
    state, metrics = jax.jit(trainer.gan_step)(state, mel, wav)
    for k, v in metrics.items():
        assert np.asarray(v).dtype == np.float32 and np.isfinite(float(v)), k


def test_checkpoint_resume_continues_identically(rng, tmp_path):
    """save -> load -> continue == uninterrupted training: the torch-layout
    round trip of params (incl. weight-norm recombination) and the native
    optimizer-state save must both be lossless."""
    from fastvocoder_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg = tiny_melgan_cfg()
    trainer = make_trainer(cfg, hp=TINY_HP, disc_cfg=TINY_DISC)
    step = jax.jit(trainer.pre_adv_step)
    batches = [make_batch(np.random.default_rng(k)) for k in range(4)]

    # uninterrupted: 4 steps
    state = trainer.init_state(jax.random.PRNGKey(0))
    for mel, wav in batches:
        state, _ = step(state, mel, wav)
    want = jax.device_get(state.gen_params)

    # interrupted: 2 steps -> save -> load -> 2 more steps
    state = trainer.init_state(jax.random.PRNGKey(0))
    for mel, wav in batches[:2]:
        state, _ = step(state, mel, wav)
    path = str(tmp_path / "ckpt.pth.tar")
    save_checkpoint(
        path, cfg, state.gen_params, state.disc_params,
        state.gen_opt_state, state.disc_opt_state,
        step=2, disc_cfg=TINY_DISC,
    )

    ckpt = load_checkpoint(path, cfg, disc_cfg=TINY_DISC)
    resumed = trainer.init_state(jax.random.PRNGKey(1))  # different seed
    resumed = resumed.replace(
        step=jnp.asarray(2, jnp.int32),
        gen_params=ckpt["gen_params"],
        disc_params=ckpt["disc_params"],
        gen_opt_state=ckpt["optimizer"],
        disc_opt_state=ckpt["discriminator_optimizer"],
    )
    for mel, wav in batches[2:]:
        resumed, _ = step(resumed, mel, wav)
    got = jax.device_get(resumed.gen_params)

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(want)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(pa)
        )


def test_remat_step_matches_standard():
    rng = np.random.default_rng(23)
    """remat=True (jax.checkpoint around the G forward) must be numerically
    identical to the standard step — it only changes what the backward
    rematerializes."""
    import jax
    import jax.numpy as jnp

    from fastvocoder_tpu.hparams import HP, MelGANConfig, ModelConfig, TINY_DISC
    from fastvocoder_tpu.train.trainer import make_trainer

    hp = HP.replace(fixed_length=12)
    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8)),
        lambda_stft=1.0,
    )
    mel = rng.standard_normal((2, 12, 80)).astype(np.float32)
    wav = (0.1 * rng.standard_normal((2, 12 * hp.hop_size))).astype(np.float32)

    outs = []
    for remat in (False, True):
        tr = make_trainer(cfg, hp=hp, disc_cfg=TINY_DISC, remat=remat)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = jax.jit(tr.gan_step)(state, mel, wav)
        outs.append((jax.device_get(state.gen_params), {k: float(v) for k, v in m.items()}))
    p0, m0 = outs[0]
    p1, m1 = outs[1]
    # the recompute fuses slightly differently (and fusion choices can vary
    # with compilation-cache state), so compare tightly but not bitwise;
    # Adam's grad normalization amplifies reassociation noise on near-zero
    # grads, hence an absolute bound of a few learning-rate quanta (lr=1e-4)
    # on the post-update params
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=0)


def test_mpd_wired_gan_step(rng):
    """`use_mpd: True` reaches training: composite gains the 5 period
    discriminators, their params update, and the step stays finite
    (the reference implements MPD but never wires it,
    reference model/discriminator/discriminator.py:16)."""
    cfg = dataclasses.replace(tiny_melgan_cfg(), use_mpd=True)
    trainer = make_trainer(cfg, hp=TINY_HP, disc_cfg=TINY_DISC)
    assert trainer.discriminator.cfg.use_mpd
    state = trainer.init_state(jax.random.PRNGKey(0))
    assert "mpd" in state.disc_params

    # composite output count: msd scales + mfd resolutions + 5 periods
    outs = trainer.discriminator.apply(
        {"params": state.disc_params}, jnp.zeros((1, FIXED * 240))
    )
    assert len(outs) == TINY_DISC.msd_scales + len(TINY_DISC.mfd_fft_sizes) + 5

    mel, wav = make_batch(rng)
    m0 = jax.tree_util.tree_leaves(state.disc_params["mpd"])[0].copy()
    state, metrics = jax.jit(trainer.gan_step)(state, mel, wav)
    for k in ("adversarial_loss", "feature_map_loss", "discriminator_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert not np.allclose(
        jax.tree_util.tree_leaves(state.disc_params["mpd"])[0], m0
    )


def test_mpd_yaml_key_parses(tmp_path):
    """YAML `use_mpd: True` flows through load_model_config."""
    import yaml

    from fastvocoder_tpu.hparams import load_model_config

    base = yaml.safe_load(open("conf/melgan/original.yaml"))
    base["use_mpd"] = True
    p = tmp_path / "mpd.yaml"
    p.write_text(yaml.safe_dump(base))
    cfg = load_model_config("melgan", str(p))
    assert cfg.use_mpd
    # default stays off (reference keeps MPD unwired)
    assert not load_model_config("melgan", "conf/melgan/original.yaml").use_mpd
