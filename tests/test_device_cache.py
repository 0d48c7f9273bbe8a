"""On-device corpus cache (data/device_cache.py).

The device path must be crop-for-crop equivalent to the host pipeline
(data.dataset.crop_item + collate semantics, reference data/dataset.py:63-73)
— only the transport changes (whole corpus staged in HBM once, per-step
crops gathered on device from two int32 index vectors).
"""

import numpy as np
import pytest

from fastvocoder_tpu.data.dataset import BufferDataset, collate
from fastvocoder_tpu.data.device_cache import DeviceCorpus
from fastvocoder_tpu.hparams import HP


@pytest.fixture
def hp():
    return HP.replace(fixed_length=10, batch_size=2, batch_expand_size=2)


@pytest.fixture
def buffer(hp):
    rng = np.random.default_rng(0)
    buf = []
    for i in range(6):
        F = 12 + i
        buf.append({
            "mel": rng.standard_normal((F, 80)).astype(np.float32),
            "wav": rng.standard_normal((F * hp.hop_size,)).astype(np.float32),
        })
    return buf


def test_gather_matches_host_collate(hp, buffer):
    corpus = DeviceCorpus(BufferDataset(buffer, hp), hp=hp)
    idx = np.array([1, 3, 5])
    starts = np.array([2, 0, 4])
    out = corpus.gather(idx, starts)
    items = []
    for i, s in zip(idx, starts):
        d = buffer[i]
        items.append({
            "mel": d["mel"][s : s + hp.fixed_length],
            "wav": d["wav"][s * hp.hop_size : (s + hp.fixed_length) * hp.hop_size],
        })
    ref = collate(items, hp)
    np.testing.assert_array_equal(np.asarray(out["mel"]), ref["mel"])
    np.testing.assert_array_equal(np.asarray(out["wav"]), ref["wav"])


def test_gather_pads_short_utterances_like_host(hp, buffer):
    """An utterance shorter than fixed_length reads zero padding — exactly
    what the host path's _pad_to produces."""
    buffer[0] = {
        "mel": buffer[0]["mel"][:6],
        "wav": buffer[0]["wav"][: 6 * hp.hop_size],
    }
    corpus = DeviceCorpus(BufferDataset(buffer, hp), hp=hp)
    out = corpus.gather(np.array([0]), np.array([0]))
    ref = collate(
        [{"mel": buffer[0]["mel"], "wav": buffer[0]["wav"]}], hp
    )
    np.testing.assert_array_equal(np.asarray(out["mel"]), ref["mel"])
    np.testing.assert_array_equal(np.asarray(out["wav"]), ref["wav"])


def test_weight_gather_and_boundary_drop(hp, buffer):
    """Basis weight targets are gathered (bf16) during the weight-L1 phase
    and dropped past the discriminator boundary (reference
    bin/train.py:87-89 consumes them only pre-adversarial)."""
    L = 30
    wstep = hp.hop_size // (L // 2)
    rng = np.random.default_rng(1)
    for it in buffer:
        F = it["mel"].shape[0]
        it["weight"] = np.abs(
            rng.standard_normal((F * wstep, 16))
        ).astype(np.float32)
    ds = BufferDataset(buffer, hp)
    corpus = DeviceCorpus(ds, hp=hp, L=L)

    out = corpus.gather(np.array([2]), np.array([1]), with_weight=True)
    assert out["weight"].shape == (1, hp.fixed_length * wstep, 16)
    ref = buffer[2]["weight"][1 * wstep : (1 + hp.fixed_length) * wstep]
    np.testing.assert_allclose(
        np.asarray(out["weight"], np.float32)[0], ref, rtol=1e-2, atol=1e-2
    )  # bf16 storage

    # stream: weight present up to weight_until, absent after
    seen = []
    for step, batch in enumerate(
        corpus.batches(seed=0, batch_size=2, weight_until=2), start=1
    ):
        seen.append("weight" in batch)
        if step == 4:
            break
    assert seen == [True, True, False, False]


def test_sample_crops_distribution(hp, buffer):
    corpus = DeviceCorpus(BufferDataset(buffer, hp), hp=hp)
    rng = np.random.default_rng(0)
    idx = np.arange(6)
    for _ in range(20):
        starts = corpus.sample_crops(rng, idx)
        lens = corpus.frames[idx]
        assert (starts >= 0).all()
        # crop never reads past the utterance's real frames
        assert (starts + hp.fixed_length <= np.maximum(lens, hp.fixed_length)).all()
        # <= fixed_length+1 utterances always start at 0 (crop_item parity)
        assert (starts[lens <= hp.fixed_length + 1] == 0).all()


def test_epoch_batch_count_matches_host_arithmetic(hp, buffer):
    from fastvocoder_tpu.data.dataset import num_batches_per_epoch

    corpus = DeviceCorpus(BufferDataset(buffer, hp), hp=hp)
    expect = num_batches_per_epoch(len(buffer), hp)
    hp_one_epoch = hp.replace(epochs=1)
    corpus.hp = hp_one_epoch
    n = sum(1 for _ in corpus.batches(seed=0))
    assert n == expect
