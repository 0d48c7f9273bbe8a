"""End-to-end CLI pipeline through the launcher surface:

    preprocess -> train -> synthesize -> publish -> test

on a tiny synthetic dataset with a tiny model — the integration test the
reference never had (SURVEY.md §4).  Each stage runs via the same `run_*`
entry points the shell scripts dispatch to (fastvocoder_tpu/bin/launcher.py).
"""

import functools
import os

import numpy as np
import pytest

from fastvocoder_tpu.hparams import HP, TINY_DISC


@pytest.fixture
def workspace(tmp_path, monkeypatch):
    """12 synthetic 0.6 s wav files + a path index, cwd moved to tmp."""
    import scipy.io.wavfile

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(3)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    paths = []
    sr = HP.sample_rate
    for i in range(12):
        t = np.arange(int(0.6 * sr)) / sr
        y = 0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t) + 0.05 * rng.standard_normal(
            t.size
        )
        p = wav_dir / f"utt_{i}.wav"
        scipy.io.wavfile.write(str(p), sr, (y * 32000).astype(np.int16))
        paths.append(str(p))
    index = tmp_path / "index.txt"
    index.write_text("\n".join(paths) + "\n")
    return tmp_path, str(index)


@pytest.mark.slow
def test_full_cli_pipeline(workspace, monkeypatch):
    tmp_path, index = workspace

    # ---- 1. preprocess ----
    from fastvocoder_tpu.bin.preprocess import run_preprocess

    run_preprocess([
        "--data_path", index,
        "--save_path", str(tmp_path / "processed"),
        "--audio_index_path", str(tmp_path / "idx_audio"),
        "--mel_index_path", str(tmp_path / "idx_mel"),
        "--no_multiprocess",
        "--train_size", "8", "--valid_size", "2", "--eval_size", "2",
    ])
    for split in ("train", "valid", "eval"):
        assert os.path.exists(tmp_path / "idx_audio" / split)
        assert os.path.exists(tmp_path / "idx_mel" / split)
    # features are the reference artifact layout: <name>.npy / <name>.mel.npy
    feats = os.listdir(tmp_path / "processed")
    assert sum(f.endswith(".mel.npy") for f in feats) == 12

    # ---- 2. train (2 steps, tiny melgan + tiny discriminator) ----
    import fastvocoder_tpu.bin.train as train_mod
    from fastvocoder_tpu.train.trainer import make_trainer

    monkeypatch.setattr(
        train_mod, "make_trainer", functools.partial(make_trainer, disc_cfg=TINY_DISC)
    )
    conf = tmp_path / "tiny.yaml"
    conf.write_text(
        "in_channels: 80\nout_channels: 1\nkernel_size: 7\n"
        "channels: [8, 8, 8, 8, 8]\nupsample_scales: [10, 6, 2, 2]\n"
        "stack_kernel_size: 3\nstacks: 3\nuse_weight_norm: True\n"
        "use_causal_conv: False\nbias: True\nmultiband: False\n"
        "lamda_stft: 1.0\nuse_feature_map_loss: True\n"
    )
    train_mod.run_train([
        "--audio_index_path", str(tmp_path / "idx_audio" / "train"),
        "--mel_index_path", str(tmp_path / "idx_mel" / "train"),
        "--audio_index_valid_path", str(tmp_path / "idx_audio" / "valid"),
        "--mel_index_valid_path", str(tmp_path / "idx_mel" / "valid"),
        "--model_name", "melgan", "--config", str(conf),
        "--batch_size", "2", "--batch_expand_size", "2",
        "--fixed_length", "10", "--max_steps", "2",
        "--save_step", "2", "--valid_step", "10000",
    ])
    ckpt_root = tmp_path / "checkpoint"
    run_dir = os.path.join(str(ckpt_root), os.listdir(ckpt_root)[0])
    ckpt = os.path.join(run_dir, "checkpoint_2.pth.tar")
    assert os.path.exists(ckpt)

    # ---- 3. synthesize (4 output wavs incl. griffin-lim reference) ----
    from fastvocoder_tpu.bin.synthesize import run_synthesizer

    mel_file = str(tmp_path / "processed" / "utt_0.wav.mel.npy")
    out_wav = str(tmp_path / "out.wav")
    run_synthesizer([
        "--checkpoint_path", ckpt, "--mel_path", mel_file,
        "--wav_path", out_wav, "--model_name", "melgan",
        "--config", str(conf),
    ])
    for suffix in ("", ".remove", ".bias", ".gl"):
        base, ext = os.path.splitext(out_wav)
        assert os.path.exists(f"{base}{suffix}{ext}" if suffix else out_wav), suffix

    # ---- 4. publish ----
    from fastvocoder_tpu.bin.publish import run_publisher

    published = str(tmp_path / "published.pth.tar")
    run_publisher([
        "--checkpoint_path", ckpt, "--model_name", "melgan",
        "--config", str(conf), "--save_path", published,
    ])
    assert os.path.exists(published)

    # ---- 5. test (RTF harness over the eval mels) ----
    from fastvocoder_tpu.bin.test import run_test

    mel_dir = tmp_path / "eval_mels"
    mel_dir.mkdir()
    for i in (0, 1):
        np.save(
            mel_dir / f"e{i}.mel.npy",
            np.load(tmp_path / "processed" / f"utt_{i}.wav.mel.npy"),
        )
    run_test([
        "--checkpoint_path", published, "--file_path", str(mel_dir),
        "--model_name", "melgan", "--config", str(conf),
    ])

    # ---- 6. evaluation (the reference's evaluation.py is broken; ours works)
    from fastvocoder_tpu.bin.evaluation import run_evaluation

    summary = run_evaluation([
        "--checkpoint_path", ckpt, "--model_name", "melgan",
        "--config", str(conf),
        "--audio_index_path", str(tmp_path / "idx_audio" / "eval"),
        "--mel_index_path", str(tmp_path / "idx_mel" / "eval"),
        "--num_items", "2",
        "--output", str(tmp_path / "eval.json"),
    ])
    assert np.isfinite(summary["mr_stft"])
    assert os.path.exists(tmp_path / "eval.json")
