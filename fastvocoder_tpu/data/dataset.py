"""Training data pipeline — reference artifact layout, TPU static shapes.

Reproduces the reference's dataset semantics (reference data/dataset.py):

  * `load_data_to_buffer` reads every (wav.npy, mel.npy) pair named by two
    index files into RAM and pickles the buffer for instant reload
    (dataset.py:19-52, `test_size` truncation dataset.py:34-35).
  * random fixed-length crops: `fixed_length` mel frames + the aligned
    `hop_size * fixed_length` wav samples (dataset.py:66-73); Basis-MelGAN
    items additionally carry ConvTasNet weight targets cropped at
    `hop_size / (L/2)` steps per frame (dataset.py:99-100).
  * mega-batches of `batch_expand_size * batch_size` items, sorted by
    pre-crop mel length descending and split into `batch_expand_size`
    sub-batches (dataset.py:131-142).

TPU deltas (deliberate, documented): every batch is padded to exactly
`fixed_length` frames — not to the max length in the batch — so jitted train
steps never recompile; host data work is plain numpy (no worker processes —
crops are O(1) views and the buffer is already in RAM); an optional
shard (index, count) slices the dataset per data-parallel host.
"""

from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from fastvocoder_tpu.hparams import HP, Hparams

Item = Dict[str, np.ndarray]


def parse_path_file(path_file: str) -> List[str]:
    """One absolute path per line (reference data/utils.py:9-14)."""
    with open(path_file, "r", encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def load_data_to_buffer(
    audio_index_path_file: str,
    mel_index_path_file: str,
    feature_savepath: Optional[str] = "features.bin",
    test_size: int = 0,
    log=print,
    with_f0: bool = False,
    write_cache: bool = True,
) -> List[Item]:
    """with_f0=True additionally loads `<name>.f0.npy` next to each
    `<name>.mel.npy` (written by preprocess --extract_f0; NHV conditioning)."""
    audio_index = parse_path_file(audio_index_path_file)
    mel_index = parse_path_file(mel_index_path_file)
    assert len(audio_index) == len(mel_index)
    n = len(audio_index)
    if test_size and test_size < n:
        n = test_size
    if feature_savepath and os.path.exists(feature_savepath):
        log(f"loading buffer from {feature_savepath}")
        with open(feature_savepath, "rb") as f:
            cached = pickle.load(f)
        # the cache file name is a fixed artifact (reference
        # data/dataset.py:19-52 pickles to features_train.bin at cwd), so a
        # run pointed at a DIFFERENT index (or test_size) must not silently
        # reuse a stale buffer: caches record the (truncated) index they
        # were built from and are rebuilt on mismatch (legacy list-format
        # caches can't be checked and are rebuilt too)
        buf = None
        if isinstance(cached, dict):
            if cached.get("mel_index") == mel_index[:n]:
                buf = cached["items"]
            else:
                log("cached buffer was built from a different index; reloading")
        else:
            log("cached buffer predates index validation; reloading")
        if buf is not None:
            if not with_f0:
                if buf and "f0" in buf[0]:
                    # an NHV run shared this cache: drop its f0 entries, or
                    # collate would pack them as a phantom 81st mel channel
                    buf = [
                        {k: v for k, v in item.items() if k != "f0"}
                        for item in buf
                    ]
                return buf
            elif buf and "f0" in buf[0]:
                return buf
            else:
                log("cached buffer lacks f0; reloading")

    buffer: List[Item] = []
    start = time.perf_counter()
    min_length = None
    for i in range(n):
        mel = np.load(mel_index[i]).T.astype(np.float32)  # (T, 80)
        wav = np.load(audio_index[i]).astype(np.float32)
        min_length = mel.shape[0] if min_length is None else min(min_length, mel.shape[0])
        item: Item = {"mel": mel, "wav": wav}
        if with_f0:
            f0_path = mel_index[i].replace(".mel.npy", ".f0.npy")
            f0 = np.load(f0_path).astype(np.float32)
            item["f0"] = f0[: mel.shape[0]]
        buffer.append(item)
    log(
        f"loaded {n} items in {time.perf_counter() - start:.1f}s; "
        f"min mel length {min_length}"
    )

    if feature_savepath and write_cache:
        # atomic replace: concurrent readers (multi-host shared FS) never
        # observe a partially written pickle
        tmp = feature_savepath + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"mel_index": mel_index[:n], "items": buffer}, f)
        os.replace(tmp, feature_savepath)
    return buffer


@dataclass
class BufferDataset:
    """In-RAM (mel, wav) pairs with random fixed-length crops."""

    buffer: List[Item]
    hp: Hparams = HP

    def __len__(self) -> int:
        return len(self.buffer)

    def mel_length(self, idx: int) -> int:
        return self.buffer[idx]["mel"].shape[0]

    def __getitem__(self, idx):  # deterministic full item (validation)
        return self.buffer[idx]

    def crop(self, idx: int, rng: np.random.Generator) -> Item:
        data = self.buffer[idx]
        return crop_item(data, rng, self.hp)


@dataclass
class WeightDataset:
    """Basis-MelGAN dataset: lazy per-item load of (mel, wav, weight) with
    aligned crops (reference data/dataset.py:77-114).  `weight_dir` holds
    `<wav-basename>.npy` ConvTasNet weight targets."""

    audio_index: List[str]
    mel_index: List[str]
    L: int
    weight_dir: str
    hp: Hparams = HP

    @classmethod
    def from_index_files(
        cls, audio_index_file: str, mel_index_file: str, L: int,
        weight_dir: str, hp: Hparams = HP, test_size: int = 0,
    ) -> "WeightDataset":
        a = parse_path_file(audio_index_file)
        m = parse_path_file(mel_index_file)
        assert len(a) == len(m)
        if test_size and test_size < len(a):  # smoke-run truncation
            a, m = a[:test_size], m[:test_size]
        return cls(a, m, L, weight_dir, hp)

    def __len__(self) -> int:
        return len(self.audio_index)

    def mel_length(self, idx: int) -> int:
        # lazy dataset: avoid loading the mel just for its length; use the
        # wav header-free npy (mel is cheaper, (80, T))
        return int(np.load(self.mel_index[idx], mmap_mode="r").shape[1])

    def load(self, idx: int) -> Item:
        mel = np.load(self.mel_index[idx]).T.astype(np.float32)
        wav = np.load(self.audio_index[idx]).astype(np.float32)
        weight_path = os.path.join(
            self.weight_dir, os.path.basename(self.audio_index[idx])
        )
        weight = np.load(weight_path).T.astype(np.float32)  # (Tw, C)
        return {"mel": mel, "wav": wav, "weight": weight}

    def __getitem__(self, idx):
        return self.load(idx)

    def crop(self, idx: int, rng: np.random.Generator) -> Item:
        return crop_item(self.load(idx), rng, self.hp, L=self.L)


def crop_item(
    data: Item, rng: np.random.Generator, hp: Hparams, L: Optional[int] = None
) -> Item:
    """Random `fixed_length`-frame crop with aligned wav (and weight) spans
    (reference data/dataset.py:63-73, 96-107).  Items shorter than
    fixed_length are taken whole (the collate pads them)."""
    len_data = data["mel"].shape[0]
    fixed = hp.fixed_length
    if len_data > fixed + 1:
        start = int(rng.integers(0, len_data - fixed))  # randint upper bound
    else:
        start = 0
    end = start + fixed
    out: Item = {
        "mel": data["mel"][start:end],
        "wav": data["wav"][start * hp.hop_size : end * hp.hop_size],
    }
    if "f0" in data:
        out["f0"] = data["f0"][start:end]
    if "weight" in data:
        wstep = hp.hop_size // (L // 2)
        out["weight"] = data["weight"][start * wstep : end * wstep]
    return out


def _pad_to(x: np.ndarray, length: int) -> np.ndarray:
    if x.shape[0] >= length:
        return x[:length]
    pad = [(0, length - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


def collate(items: Sequence[Item], hp: Hparams, L: Optional[int] = None) -> Item:
    """Stack crops into a static-shape batch: mel (B, fixed, 80), wav
    (B, fixed*hop) [, weight (B, fixed*hop/(L/2), C)]."""
    fixed = hp.fixed_length
    batch: Item = {
        "mel": np.stack([_pad_to(d["mel"], fixed) for d in items]),
        "wav": np.stack([_pad_to(d["wav"], fixed * hp.hop_size) for d in items]),
    }
    if "f0" in items[0]:
        # NHV conditioning: pack f0 as mel channel 80 (dsp/f0.py) so the
        # batch keeps the standard {mel, wav} shape contract
        f0 = np.stack([_pad_to(d["f0"], fixed) for d in items])
        batch["mel"] = np.concatenate([batch["mel"], f0[..., None]], axis=-1)
    if "weight" in items[0]:
        wlen = fixed * (hp.hop_size // (L // 2))
        batch["weight"] = np.stack([_pad_to(d["weight"], wlen) for d in items])
    return batch


def batch_iterator(
    dataset,
    hp: Hparams = HP,
    seed: int = 0,
    epoch: int = 0,
    L: Optional[int] = None,
    shard_index: int = 0,
    shard_count: int = 1,
    batch_size: Optional[int] = None,
) -> Iterator[Item]:
    """One epoch of training batches.

    Reference scheme (data/dataset.py:131-142 + bin/train.py:398-405):
    shuffle, take mega-batches of `batch_expand_size * batch_size`, sort each
    by mel length descending, emit `batch_expand_size` sub-batches.  With
    `shard_count > 1` each host sees a disjoint 1/shard_count slice of the
    shuffled epoch (data-parallel input sharding).
    """
    bs = batch_size if batch_size is not None else hp.batch_size
    mega = bs * hp.batch_expand_size
    rng = np.random.default_rng((seed, epoch))

    order = rng.permutation(len(dataset))
    # per-host shard: contiguous slice of the common shuffle
    per = len(order) // shard_count
    order = order[shard_index * per : (shard_index + 1) * per]

    for m in range(len(order) // mega):
        idxs = order[m * mega : (m + 1) * mega]
        lengths = np.array([dataset.mel_length(i) for i in idxs])
        idxs = idxs[np.argsort(-lengths)]
        for j in range(hp.batch_expand_size):
            sub = idxs[j * bs : (j + 1) * bs]
            items = [dataset.crop(int(i), rng) for i in sub]
            yield collate(items, hp, L=L)


def num_batches_per_epoch(
    dataset_len: int, hp: Hparams, shard_count: int = 1,
    batch_size: Optional[int] = None,
) -> int:
    bs = batch_size if batch_size is not None else hp.batch_size
    mega = bs * hp.batch_expand_size
    return ((dataset_len // shard_count) // mega) * hp.batch_expand_size
