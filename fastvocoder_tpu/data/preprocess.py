"""Feature extraction: wav -> (wav.npy, mel.npy) + train/valid/eval splits.

Parity with reference bin/preprocess.py: per file, load at 24 kHz
(unencoded), extract the normalized mel (dsp.audio.melspectrogram — librosa
parity), save `<name>.npy` (wav) and `<name>.mel.npy` (mel) into save_path
(bin/preprocess.py:41-49), optionally in a `ProcessPoolExecutor(cpu_count()//2)`
pool (bin/preprocess.py:13,52-72), then shuffle and write train/valid/eval
index files of sizes hp.train_size/valid_size/eval_size
(bin/preprocess.py:99-107).

Delta from the reference: failed files are *reported*, not silently dropped
(the reference's bare try/except is a documented wart, SURVEY.md §5).
"""

from __future__ import annotations

import os
import random
from concurrent.futures import ProcessPoolExecutor
from functools import partial
from multiprocessing import cpu_count
from typing import List, Optional, Tuple

import numpy as np

from fastvocoder_tpu.data.dataset import parse_path_file
from fastvocoder_tpu.dsp import audio
from fastvocoder_tpu.hparams import HP, Hparams


def extract_one(
    wav_filepath: str, mel_filepath: str, new_wav_filepath: str, hp: Hparams = HP,
    extract_f0: bool = False,
) -> Optional[int]:
    """Returns the mel frame count, or None on failure."""
    try:
        y = audio.load_wav(wav_filepath, sample_rate=hp.sample_rate, encode=False)
        mel = audio.melspectrogram(y, hp)  # (80, T)
        np.save(mel_filepath, mel)
        np.save(new_wav_filepath, y)
        if extract_f0:  # NHV conditioning (dsp/f0.py)
            from fastvocoder_tpu.dsp.f0 import extract_f0 as _f0

            np.save(
                mel_filepath.replace(".mel.npy", ".f0.npy"),
                _f0(y, hp)[: mel.shape[1]],
            )
        return int(mel.shape[1])
    except Exception as e:  # noqa: BLE001 — per-file isolation
        print(f"ERROR processing {wav_filepath}: {e}")
        return None


def preprocess(
    data_path_file: str,
    save_path: str,
    hp: Hparams = HP,
    multiprocess: bool = True,
    max_workers: Optional[int] = None,
    extract_f0: bool = False,
) -> Tuple[List[str], List[str]]:
    """Extract features for every wav in the index file; returns
    (audio_index, mel_index) path lists (failed files excluded)."""
    os.makedirs(save_path, exist_ok=True)
    wav_paths = parse_path_file(data_path_file)

    jobs = []
    for wav_filepath in wav_paths:
        wav_filename = os.path.basename(wav_filepath)
        jobs.append(
            (
                wav_filepath,
                os.path.join(save_path, f"{wav_filename}.mel.npy"),
                os.path.join(save_path, f"{wav_filename}.npy"),
            )
        )

    if multiprocess:
        workers = max_workers or max(1, cpu_count() // 2)
        with ProcessPoolExecutor(max_workers=workers) as ex:
            lengths = list(
                ex.map(
                    partial(_kernel, hp=hp, extract_f0=extract_f0),
                    jobs, chunksize=8,
                )
            )
    else:
        lengths = [_kernel(j, hp=hp, extract_f0=extract_f0) for j in jobs]

    audio_index, mel_index, ok_lengths = [], [], []
    for (wav_fp, mel_fp, new_wav_fp), n in zip(jobs, lengths):
        if n is None:
            continue
        audio_index.append(new_wav_fp)
        mel_index.append(mel_fp)
        ok_lengths.append(n)
    if ok_lengths:
        print(f"min length of mel spectrogram is {min(ok_lengths)}.")
    failed = len(jobs) - len(ok_lengths)
    if failed:
        print(f"WARNING: {failed}/{len(jobs)} files failed feature extraction")
    return audio_index, mel_index


def _kernel(job, hp: Hparams, extract_f0: bool = False):
    return extract_one(*job, hp=hp, extract_f0=extract_f0)


def write_file(
    audio_index: List[str],
    mel_index: List[str],
    index_list,
    file_name: str,
    audio_index_path: str,
    mel_index_path: str,
):
    with open(os.path.join(audio_index_path, file_name), "w", encoding="utf-8") as f:
        for index in index_list:
            f.write(audio_index[index] + "\n")
    with open(os.path.join(mel_index_path, file_name), "w", encoding="utf-8") as f:
        for index in index_list:
            f.write(mel_index[index] + "\n")


def write_splits(
    audio_index: List[str],
    mel_index: List[str],
    audio_index_path: str,
    mel_index_path: str,
    hp: Hparams = HP,
    seed: Optional[int] = None,
):
    """Shuffled train/valid/eval index files (reference bin/preprocess.py:99-107)."""
    os.makedirs(audio_index_path, exist_ok=True)
    os.makedirs(mel_index_path, exist_ok=True)
    total = hp.train_size + hp.valid_size + hp.eval_size
    assert len(audio_index) >= total, (
        f"need {total} processed files, have {len(audio_index)}"
    )
    index_list = list(range(total))
    random.Random(seed).shuffle(index_list) if seed is not None else random.shuffle(
        index_list
    )
    a, b = hp.train_size, hp.train_size + hp.valid_size
    write_file(audio_index, mel_index, index_list[:a], "train", audio_index_path, mel_index_path)
    write_file(audio_index, mel_index, index_list[a:b], "valid", audio_index_path, mel_index_path)
    write_file(audio_index, mel_index, index_list[b:total], "eval", audio_index_path, mel_index_path)
