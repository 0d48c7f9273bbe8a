"""End-to-end train-driver smoke test: bin/train.run on a tiny synthetic
dataset — exercises buffer loading, the prefetch pipeline, on-device metric
draining, checkpointing, and the full-utterance masked validation sweep."""

import functools
import os
from argparse import Namespace

import numpy as np
import pytest

from fastvocoder_tpu.hparams import TINY_DISC
from fastvocoder_tpu.losses.stft_loss import (
    multi_resolution_stft_loss,
    multi_resolution_stft_loss_masked,
)


def test_masked_loss_equals_unmasked_at_full_length(rng):
    """With no padding (valid_samples == T) the mask is a no-op."""
    x = rng.standard_normal((1, 4800)).astype(np.float32)
    y = rng.standard_normal((1, 4800)).astype(np.float32)
    sc, mag = multi_resolution_stft_loss(x, y)
    sc_m, mag_m = multi_resolution_stft_loss_masked(x, y, np.int32(4800))
    np.testing.assert_allclose(float(sc), float(sc_m), rtol=1e-5)
    np.testing.assert_allclose(float(mag), float(mag_m), rtol=1e-5)


def test_masked_loss_ignores_padding(rng):
    """Corrupting the padded tail must not change the masked loss."""
    x = rng.standard_normal((1, 4800)).astype(np.float32)
    y = rng.standard_normal((1, 4800)).astype(np.float32)
    valid = 2400
    x2 = x.copy()
    x2[:, valid:] = 5.0  # garbage tail
    sc1, mag1 = multi_resolution_stft_loss_masked(x, y, np.int32(valid))
    sc2, mag2 = multi_resolution_stft_loss_masked(x2, y, np.int32(valid))
    # frames starting before `valid` may still cover a bit of tail via their
    # window; restrict the equality claim to the clean prefix frames by
    # corrupting only beyond the largest window reach
    reach = valid + 2048
    x3 = x.copy()
    x3[:, reach:] = 5.0
    sc3, mag3 = multi_resolution_stft_loss_masked(x3, y, np.int32(valid))
    np.testing.assert_allclose(float(sc1), float(sc3), rtol=1e-6)
    np.testing.assert_allclose(float(mag1), float(mag3), rtol=1e-6)


@pytest.fixture
def tiny_dataset(tmp_path):
    """8 (wav.npy, mel.npy) pairs + index files, ~60-100 mel frames each."""
    rng = np.random.default_rng(1)
    audio_idx, mel_idx = [], []
    for i in range(8):
        frames = int(rng.integers(60, 100))
        wav = (0.3 * np.sin(np.linspace(0, 200, frames * 240))).astype(np.float32)
        mel = rng.random((80, frames)).astype(np.float32)
        wp = tmp_path / f"{i}.wav.npy"
        mp = tmp_path / f"{i}.mel.npy"
        np.save(wp, wav)
        np.save(mp, mel)
        audio_idx.append(str(wp))
        mel_idx.append(str(mp))
    a = tmp_path / "audio_train.txt"
    m = tmp_path / "mel_train.txt"
    a.write_text("\n".join(audio_idx) + "\n")
    m.write_text("\n".join(mel_idx) + "\n")
    return str(a), str(m)


@pytest.mark.slow
def test_train_driver_smoke(tiny_dataset, tmp_path, monkeypatch):
    import fastvocoder_tpu.bin.train as train_mod
    from fastvocoder_tpu.train.trainer import make_trainer

    monkeypatch.chdir(tmp_path)
    # tiny widths for CPU: same structure, fraction of the compile cost
    monkeypatch.setattr(
        train_mod, "make_trainer", functools.partial(make_trainer, disc_cfg=TINY_DISC)
    )

    conf = tmp_path / "melgan_tiny.yaml"
    conf.write_text(
        "in_channels: 80\nout_channels: 1\nkernel_size: 7\n"
        "channels: [8, 8, 8, 8, 8]\nupsample_scales: [10, 6, 2, 2]\n"
        "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
        "use_causal_conv: False\nbias: True\nmultiband: False\n"
        "lamda_stft: 1.0\nuse_feature_map_loss: True\n"
    )

    audio_idx, mel_idx = tiny_dataset
    args = Namespace(
        audio_index_path=audio_idx, mel_index_path=mel_idx,
        audio_index_valid_path=audio_idx, mel_index_valid_path=mel_idx,
        checkpoint_path="", restore_step=0,
        learning_rate=1e-4, learning_rate_discriminator=5e-5,
        model_name="melgan", config=str(conf),
        use_scheduler=0, mixprecision=0,
        basis_dataset_path="", seed=0,
        max_steps=6, test_size=0,
        batch_size=2, batch_expand_size=2, fixed_length=10,
        save_step=4, valid_step=4, valid_num=2,
        discriminator_train_start_steps=100000,
    )
    state = train_mod.run(args)
    assert int(np.asarray(state.step)) == 6

    # per-step loss files have one line per step (reference format)
    logger_dirs = os.listdir(tmp_path / "logger")
    assert len(logger_dirs) == 1
    logdir = tmp_path / "logger" / logger_dirs[0]
    assert len((logdir / "total_loss.txt").read_text().splitlines()) == 6
    assert len((logdir / "stft_loss.txt").read_text().splitlines()) == 6
    assert (logdir / "logger.txt").read_text().strip()

    # save_step checkpoint written
    ckpt_dirs = os.listdir(tmp_path / "checkpoint")
    assert len(ckpt_dirs) == 1
    saved = os.listdir(tmp_path / "checkpoint" / ckpt_dirs[0])
    assert "checkpoint_4.pth.tar" in saved
    # max_steps exit also saves the tail progress (segmented-run support)
    assert "checkpoint_6.pth.tar" in saved

    # scalar JSON export on close (reference tensorboardX
    # export_scalars_to_json, bin/train.py:473)
    import json

    scalars = json.loads((logdir / "all_scalars.json").read_text())
    assert "stft_loss" in scalars and "valid_stft_loss" in scalars
    assert all(len(pair) == 2 for pair in scalars["stft_loss"])


@pytest.mark.slow
def test_train_driver_run_dir(tiny_dataset, tmp_path, monkeypatch):
    """--run_dir makes the run self-contained (checkpoint/logger/tensorboard
    under <run_dir>/) and a second invocation resumes from
    <run_dir>/checkpoint — the contract tools/train_supervised.sh relies on
    for segmented long runs."""
    import fastvocoder_tpu.bin.train as train_mod
    from fastvocoder_tpu.train.trainer import make_trainer

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        train_mod, "make_trainer", functools.partial(make_trainer, disc_cfg=TINY_DISC)
    )
    conf = tmp_path / "melgan_tiny.yaml"
    conf.write_text(
        "in_channels: 80\nout_channels: 1\nkernel_size: 7\n"
        "channels: [8, 8, 8, 8, 8]\nupsample_scales: [10, 6, 2, 2]\n"
        "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
        "use_causal_conv: False\nbias: True\nmultiband: False\n"
        "lamda_stft: 1.0\nuse_feature_map_loss: True\n"
    )
    audio_idx, mel_idx = tiny_dataset
    run_dir = tmp_path / "runs" / "exp"
    args = Namespace(
        audio_index_path=audio_idx, mel_index_path=mel_idx,
        audio_index_valid_path=audio_idx, mel_index_valid_path=mel_idx,
        checkpoint_path="", run_dir=str(run_dir), restore_step=0,
        learning_rate=1e-4, learning_rate_discriminator=5e-5,
        model_name="melgan", config=str(conf),
        use_scheduler=0, mixprecision=0,
        basis_dataset_path="", seed=0,
        max_steps=2, test_size=0,
        batch_size=2, batch_expand_size=2, fixed_length=10,
        save_step=2, valid_step=100, valid_num=2,
        discriminator_train_start_steps=100000,
    )
    state = train_mod.run(args)
    assert int(np.asarray(state.step)) == 2

    for sub in ("checkpoint", "logger", "tensorboard"):
        stamps = os.listdir(run_dir / sub)
        assert len(stamps) == 1, sub
    # nothing leaked into the cwd-relative hp defaults
    assert not (tmp_path / "checkpoint").exists()
    assert not (tmp_path / "logger").exists()
    stamp = os.listdir(run_dir / "checkpoint")[0]
    assert "checkpoint_2.pth.tar" in os.listdir(run_dir / "checkpoint" / stamp)

    # segment 2: resume from <run_dir>/checkpoint, continue to step 4
    args.checkpoint_path = str(run_dir / "checkpoint")
    args.max_steps = 4
    state = train_mod.run(args)
    assert int(np.asarray(state.step)) == 4
    newest = sorted(
        os.listdir(run_dir / "checkpoint"),
        key=lambda d: os.path.getmtime(str(run_dir / "checkpoint" / d)),
    )[-1]
    assert "checkpoint_4.pth.tar" in os.listdir(run_dir / "checkpoint" / newest)


@pytest.mark.slow
def test_basis_melgan_driver_smoke_with_fitted_targets(tmp_path, monkeypatch):
    """Train the flagship model end-to-end from audio alone: fit the basis
    and weight targets with tools/make_basis_dataset.py (the in-framework
    replacement for the reference's external ConvTasNet artifacts,
    reference bin/train.py:298-300), then drive bin/train.run on them —
    WeightDataset crops, the frozen basis layer, and the weight-L1 phase
    (reference bin/train.py:87-89) all exercised through the real driver."""
    import sys

    import fastvocoder_tpu.bin.train as train_mod
    from fastvocoder_tpu.train.trainer import make_trainer

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    from make_basis_dataset import main as make_basis_main

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        train_mod, "make_trainer", functools.partial(make_trainer, disc_cfg=TINY_DISC)
    )

    rng = np.random.default_rng(3)
    audio_idx, mel_idx = [], []
    for i in range(4):
        frames = int(rng.integers(12, 16))
        wav = (0.3 * np.sin(np.linspace(0, 80, frames * 240))).astype(np.float32)
        mel = rng.random((80, frames)).astype(np.float32)
        wp = tmp_path / f"{i}.wav.npy"
        mp = tmp_path / f"{i}.mel.npy"
        np.save(wp, wav)
        np.save(mp, mel)
        audio_idx.append(str(wp))
        mel_idx.append(str(mp))
    a = tmp_path / "audio_train.txt"
    m = tmp_path / "mel_train.txt"
    a.write_text("\n".join(audio_idx) + "\n")
    m.write_text("\n".join(mel_idx) + "\n")

    basis_dir = tmp_path / "basis"
    make_basis_main([
        "--audio_index", str(a), "--out_dir", str(basis_dir),
        "--L", "30", "--C", "16", "--iters", "10",
    ])

    conf = tmp_path / "basis_tiny.yaml"
    conf.write_text(
        "L: 30\nin_channels: 80\nout_channels: 16\nkernel_size: 7\n"
        "channels: [16, 16, 16]\nupsample_scales: [4, 4]\n"
        "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
        "use_causal_conv: False\nlamda_stft: 1.0\nmultiband: False\n"
        "use_feature_map_loss: False\ntransposedconv: True\n"
    )

    args = Namespace(
        audio_index_path=str(a), mel_index_path=str(m),
        audio_index_valid_path=str(a), mel_index_valid_path=str(m),
        checkpoint_path="", restore_step=0,
        learning_rate=1e-4, learning_rate_discriminator=5e-5,
        model_name="basis-melgan", config=str(conf),
        use_scheduler=0, mixprecision=0,
        basis_dataset_path=str(basis_dir), seed=0,
        max_steps=5, test_size=0,
        batch_size=2, batch_expand_size=2, fixed_length=10,
        save_step=1000, valid_step=10000, valid_num=2,
        discriminator_train_start_steps=100000,
        device_cache=1,  # HBM corpus cache + on-device crops + weight gather
    )
    state = train_mod.run(args)
    assert int(np.asarray(state.step)) == 5

    # the weight-L1 phase really saw the fitted targets
    logger_dirs = os.listdir(tmp_path / "logger")
    logdir = tmp_path / "logger" / logger_dirs[0]
    text = (logdir / "logger.txt").read_text()
    assert "weight_loss" in text
    # basis stayed frozen at the fitted value (reference bin/train.py:329-331)
    basis = np.load(basis_dir / "basis_signal_weight.npy")
    trained = np.asarray(state.gen_params["basis_signal"]["basis"])
    np.testing.assert_allclose(trained, basis, rtol=0, atol=0)


@pytest.mark.slow
def test_train_driver_wall_deadline(tiny_dataset, tmp_path, monkeypatch):
    """TRAIN_DEADLINE_EPOCH stops the step loop at the first boundary past
    the deadline and still saves a tail checkpoint — the hard chip-idle
    guarantee tools/round4b_session.sh relies on (the supervisor's
    DEADLINE_EPOCH only refuses to START segments, so without this a long
    segment could stay live through a benchmark capture window)."""
    import functools
    import time

    import fastvocoder_tpu.bin.train as train_mod
    from fastvocoder_tpu.train.trainer import make_trainer

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        train_mod, "make_trainer", functools.partial(make_trainer, disc_cfg=TINY_DISC)
    )
    monkeypatch.setenv("TRAIN_DEADLINE_EPOCH", str(time.time() - 10))
    conf = tmp_path / "melgan_tiny.yaml"
    conf.write_text(
        "in_channels: 80\nout_channels: 1\nkernel_size: 7\n"
        "channels: [8, 8, 8, 8, 8]\nupsample_scales: [10, 6, 2, 2]\n"
        "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
        "use_causal_conv: False\nbias: True\nmultiband: False\n"
        "lamda_stft: 1.0\nuse_feature_map_loss: True\n"
    )
    audio_idx, mel_idx = tiny_dataset
    args = Namespace(
        audio_index_path=audio_idx, mel_index_path=mel_idx,
        audio_index_valid_path=audio_idx, mel_index_valid_path=mel_idx,
        checkpoint_path="", restore_step=0,
        learning_rate=1e-4, learning_rate_discriminator=5e-5,
        model_name="melgan", config=str(conf),
        use_scheduler=0, mixprecision=0,
        basis_dataset_path="", seed=0,
        max_steps=6, test_size=0,
        batch_size=2, batch_expand_size=2, fixed_length=10,
        save_step=4, valid_step=4, valid_num=2,
        discriminator_train_start_steps=100000,
    )
    state = train_mod.run(args)
    # one step completes (the check sits at the step boundary), then the
    # deadline fires — far short of max_steps=6
    assert int(np.asarray(state.step)) == 1
    ckpt_dirs = os.listdir(tmp_path / "checkpoint")
    saved = os.listdir(tmp_path / "checkpoint" / ckpt_dirs[0])
    assert "checkpoint_1.pth.tar" in saved


@pytest.mark.slow
def test_train_driver_malformed_deadline(tiny_dataset, tmp_path, monkeypatch):
    """A malformed TRAIN_DEADLINE_EPOCH must not kill the segment at launch
    (under the supervisor that would loop every segment into an instant
    crash, ADVICE r04 item 3) — the run proceeds without a deadline."""
    import functools

    import fastvocoder_tpu.bin.train as train_mod
    from fastvocoder_tpu.train.trainer import make_trainer

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        train_mod, "make_trainer", functools.partial(make_trainer, disc_cfg=TINY_DISC)
    )
    monkeypatch.setenv("TRAIN_DEADLINE_EPOCH", "not-a-number")
    conf = tmp_path / "melgan_tiny.yaml"
    conf.write_text(
        "in_channels: 80\nout_channels: 1\nkernel_size: 7\n"
        "channels: [8, 8, 8, 8, 8]\nupsample_scales: [10, 6, 2, 2]\n"
        "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
        "use_causal_conv: False\nbias: True\nmultiband: False\n"
        "lamda_stft: 1.0\nuse_feature_map_loss: True\n"
    )
    audio_idx, mel_idx = tiny_dataset
    args = Namespace(
        audio_index_path=audio_idx, mel_index_path=mel_idx,
        audio_index_valid_path=audio_idx, mel_index_valid_path=mel_idx,
        checkpoint_path="", restore_step=0,
        learning_rate=1e-4, learning_rate_discriminator=5e-5,
        model_name="melgan", config=str(conf),
        use_scheduler=0, mixprecision=0,
        basis_dataset_path="", seed=0,
        max_steps=2, test_size=0,
        batch_size=2, batch_expand_size=2, fixed_length=10,
        save_step=4, valid_step=4, valid_num=2,
        discriminator_train_start_steps=100000,
    )
    state = train_mod.run(args)
    # the garbage value was ignored: the run reached max_steps, not step 1
    assert int(np.asarray(state.step)) == 2
