"""Data pipeline unit tests (pure numpy — no jax compile cost)."""

import os

import numpy as np
import pytest

from fastvocoder_tpu.data.dataset import (
    BufferDataset,
    batch_iterator,
    collate,
    crop_item,
    load_data_to_buffer,
    num_batches_per_epoch,
    parse_path_file,
)
from fastvocoder_tpu.hparams import HP

HOP = HP.hop_size


def _hp(fixed=10, bs=2, expand=2):
    return HP.replace(fixed_length=fixed, batch_size=bs, batch_expand_size=expand)


def _buffer(rng, n=9, min_frames=12, max_frames=40):
    out = []
    for _ in range(n):
        T = int(rng.integers(min_frames, max_frames))
        out.append(
            {
                "mel": rng.standard_normal((T, 80)).astype(np.float32),
                "wav": rng.standard_normal((T * HOP,)).astype(np.float32),
            }
        )
    return out


def test_crop_alignment(rng):
    hp = _hp(fixed=10)
    item = {
        "mel": rng.standard_normal((30, 80)).astype(np.float32),
        "wav": np.arange(30 * HOP, dtype=np.float32),
    }
    c = crop_item(item, rng, hp)
    assert c["mel"].shape == (10, 80)
    assert c["wav"].shape == (10 * HOP,)
    # wav crop starts exactly at start_frame * hop (wav is arange)
    start = int(c["wav"][0])
    assert start % HOP == 0
    frame = start // HOP
    np.testing.assert_array_equal(c["mel"], item["mel"][frame : frame + 10])


def test_crop_weight_alignment(rng):
    hp = _hp(fixed=10)
    L = 30
    wstep = HOP // (L // 2)  # 16
    item = {
        "mel": rng.standard_normal((30, 80)).astype(np.float32),
        "wav": np.arange(30 * HOP, dtype=np.float32),
        "weight": np.arange(30 * wstep, dtype=np.float32)[:, None].repeat(4, 1),
    }
    c = crop_item(item, rng, hp, L=L)
    frame = int(c["wav"][0]) // HOP
    assert c["weight"].shape == (10 * wstep, 4)
    assert int(c["weight"][0, 0]) == frame * wstep


def test_collate_pads_to_fixed(rng):
    hp = _hp(fixed=20)
    items = [
        {
            "mel": rng.standard_normal((12, 80)).astype(np.float32),
            "wav": rng.standard_normal((12 * HOP,)).astype(np.float32),
        },
        {
            "mel": rng.standard_normal((20, 80)).astype(np.float32),
            "wav": rng.standard_normal((20 * HOP,)).astype(np.float32),
        },
    ]
    b = collate(items, hp)
    assert b["mel"].shape == (2, 20, 80)
    assert b["wav"].shape == (2, 20 * HOP)
    # short item zero-padded
    assert np.all(b["mel"][0, 12:] == 0)


def test_batch_iterator_shapes_and_count(rng):
    hp = _hp(fixed=10, bs=2, expand=2)
    ds = BufferDataset(_buffer(rng, n=9), hp)
    batches = list(batch_iterator(ds, hp, seed=1, epoch=0))
    # 9 items, mega=4 -> 2 megabatches -> 4 sub-batches
    assert len(batches) == 4
    assert len(batches) == num_batches_per_epoch(len(ds), hp)
    for b in batches:
        assert b["mel"].shape == (2, 10, 80)
        assert b["wav"].shape == (2, 10 * HOP)


def test_batch_iterator_sharding_disjoint(rng):
    hp = _hp(fixed=10, bs=1, expand=1)
    ds = BufferDataset(_buffer(rng, n=8), hp)
    a = list(batch_iterator(ds, hp, seed=3, epoch=0, shard_index=0, shard_count=2))
    b = list(batch_iterator(ds, hp, seed=3, epoch=0, shard_index=1, shard_count=2))
    assert len(a) == len(b) == 4
    # shards see disjoint items: compare mel fingerprints
    fa = {float(x["mel"].sum()) for x in a}
    fb = {float(x["mel"].sum()) for x in b}
    assert not (fa & fb)


def test_buffer_cache_roundtrip(tmp_path, rng):
    d = tmp_path / "feat"
    d.mkdir()
    audio_idx, mel_idx = [], []
    for i in range(3):
        wav = rng.standard_normal((12 * HOP,)).astype(np.float32)
        mel = rng.standard_normal((80, 12)).astype(np.float32)
        wp, mp = d / f"u{i}.wav.npy", d / f"u{i}.wav.mel.npy"
        np.save(wp, wav)
        np.save(mp, mel)
        audio_idx.append(str(wp))
        mel_idx.append(str(mp))
    af, mf = tmp_path / "audio.txt", tmp_path / "mel.txt"
    af.write_text("\n".join(audio_idx) + "\n")
    mf.write_text("\n".join(mel_idx) + "\n")

    cache = str(tmp_path / "features.bin")
    buf1 = load_data_to_buffer(str(af), str(mf), feature_savepath=cache)
    assert os.path.exists(cache)
    buf2 = load_data_to_buffer(str(af), str(mf), feature_savepath=cache)
    assert len(buf1) == len(buf2) == 3
    np.testing.assert_array_equal(buf1[0]["mel"], buf2[0]["mel"])
    assert buf1[0]["mel"].shape == (12, 80)  # transposed to (T, 80)

    assert parse_path_file(str(af)) == audio_idx


def test_buffer_cache_rejects_stale_index(tmp_path, rng):
    """The cache file name is a fixed artifact (features_train.bin at cwd,
    reference data/dataset.py:19-52): a run pointed at a DIFFERENT index
    must rebuild, not silently train on the previous corpus."""
    bufs = {}
    for corpus in ("a", "b"):
        d = tmp_path / corpus
        d.mkdir()
        audio_idx, mel_idx = [], []
        for i in range(2):
            wav = rng.standard_normal((12 * HOP,)).astype(np.float32)
            mel = rng.standard_normal((80, 12)).astype(np.float32)
            wp, mp = d / f"u{i}.wav.npy", d / f"u{i}.wav.mel.npy"
            np.save(wp, wav)
            np.save(mp, mel)
            audio_idx.append(str(wp))
            mel_idx.append(str(mp))
        (tmp_path / f"audio_{corpus}.txt").write_text("\n".join(audio_idx) + "\n")
        (tmp_path / f"mel_{corpus}.txt").write_text("\n".join(mel_idx) + "\n")

    cache = str(tmp_path / "features.bin")
    buf_a = load_data_to_buffer(
        str(tmp_path / "audio_a.txt"), str(tmp_path / "mel_a.txt"),
        feature_savepath=cache,
    )
    buf_b = load_data_to_buffer(
        str(tmp_path / "audio_b.txt"), str(tmp_path / "mel_b.txt"),
        feature_savepath=cache,
    )
    assert not np.array_equal(buf_a[0]["mel"], buf_b[0]["mel"])
    # and the rebuilt cache now serves corpus b
    buf_b2 = load_data_to_buffer(
        str(tmp_path / "audio_b.txt"), str(tmp_path / "mel_b.txt"),
        feature_savepath=cache,
    )
    np.testing.assert_array_equal(buf_b[0]["mel"], buf_b2[0]["mel"])


def test_buffer_cache_f0_isolation(tmp_path, rng):
    """A cache written by an NHV run (f0-bearing items) must not leak f0
    into a later non-NHV run sharing the same cache path — collate would
    pack it as a phantom 81st mel channel."""
    d = tmp_path / "feat"
    d.mkdir()
    audio_idx, mel_idx = [], []
    for i in range(2):
        wav = rng.standard_normal((12 * HOP,)).astype(np.float32)
        mel = rng.standard_normal((80, 12)).astype(np.float32)
        f0 = np.abs(rng.standard_normal((12,))).astype(np.float32)
        wp, mp = d / f"u{i}.wav.npy", d / f"u{i}.wav.mel.npy"
        np.save(wp, wav)
        np.save(mp, mel)
        np.save(d / f"u{i}.wav.f0.npy", f0)
        audio_idx.append(str(wp))
        mel_idx.append(str(mp))
    af, mf = tmp_path / "audio.txt", tmp_path / "mel.txt"
    af.write_text("\n".join(audio_idx) + "\n")
    mf.write_text("\n".join(mel_idx) + "\n")

    cache = str(tmp_path / "features.bin")
    buf_f0 = load_data_to_buffer(
        str(af), str(mf), feature_savepath=cache, with_f0=True
    )
    assert "f0" in buf_f0[0]
    buf_plain = load_data_to_buffer(str(af), str(mf), feature_savepath=cache)
    assert all("f0" not in item for item in buf_plain)
    # and the reverse direction still upgrades a plain cache
    os.remove(cache)
    load_data_to_buffer(str(af), str(mf), feature_savepath=cache)
    buf_up = load_data_to_buffer(
        str(af), str(mf), feature_savepath=cache, with_f0=True
    )
    assert "f0" in buf_up[0]
