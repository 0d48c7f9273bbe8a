"""Build a Basis-MelGAN training dataset from preprocessed audio alone.

The reference trains Basis-MelGAN against targets produced OUTSIDE the
repo: a ConvTasNet teacher provides both the frozen decoder basis
(`Basis-MelGAN-dataset/basis_signal_weight.npy`, loaded at reference
bin/train.py:298-300) and per-utterance non-negative weight targets
(`Basis-MelGAN-dataset/weight/<name>`, reference data/dataset.py:90-100).
Without that external pipeline the flagship model cannot be trained.

This tool removes the external dependency: it fits the basis and the
weight targets directly from the preprocessed wav artifacts with a
semi-NMF (W >= 0, basis unconstrained — Ding, Li & Jordan, "Convex and
Semi-Nonnegative Matrix Factorizations", IEEE TPAMI 2010):

    frames(wav)  ~=  W @ B,   W >= 0 (N, C),  B (C, L) free

where `frames` is the exact adjoint of the model's 50%-overlap-add decode
(reference modules.py:255-267): frame f covers samples [f*h, f*h + L) with
h = L/2, scaled by 1/coverage so that overlap-adding the frames
reconstructs the wav exactly.  The fitted basis is written as
`basis_signal_weight.npy` in the reference's (L, C) layout and each
utterance's weights as `weight/<wav-npy-basename>` in the reference's
(C, Tw) layout (data/dataset.py loads them transposed), so `train.sh
basis-melgan ...` runs on the result unchanged.

The model ends in a ReLU (reference basis_melgan.py:120-121), so
non-negative targets are the ones it can actually express; the weight-L1
phase (reference bin/train.py:87-89) then distills W before the
adversarial phase takes over.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wav_to_frames(wav: np.ndarray, L: int) -> np.ndarray:
    """(T,) -> (Tw, L) coverage-normalized 50%-overlap frames with
    Tw = ceil(T / h); overlap-adding the result reproduces wav exactly."""
    h = L // 2
    T = wav.shape[0]
    Tw = -(-T // h)
    pad = np.pad(wav, (0, Tw * h + h - T))
    cover = np.zeros_like(pad)
    idx = np.arange(L)
    for f in range(Tw):
        cover[f * h : f * h + L] += 1.0
    frames = pad[np.add.outer(np.arange(Tw) * h, idx)]
    return (frames / cover[np.add.outer(np.arange(Tw) * h, idx)]).astype(
        np.float32
    )


def semi_nmf(
    X: np.ndarray, C: int, iters: int = 80, seed: int = 0, eps: float = 1e-9,
    log=print,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit X (N, L) ~= W (N, C, >=0) @ B (C, L).  Multiplicative W update
    + least-squares B update (semi-NMF)."""
    rng = np.random.default_rng(seed)
    N, L = X.shape
    # init basis from random data frames (plus noise to break duplicates)
    B = X[rng.choice(N, C, replace=N < C)] + 1e-4 * rng.standard_normal(
        (C, L)
    ).astype(np.float32)
    W = np.abs(X @ B.T) / (np.sum(B * B, axis=1) + eps)

    norm_x = float(np.sum(X * X))
    for it in range(iters):
        # B: ridge least squares given W
        G = W.T @ W + 1e-6 * np.eye(C, dtype=np.float64)
        B = np.linalg.solve(G, W.T @ X).astype(np.float32)
        # fix the W·diag(s) / diag(1/s)·B scale indeterminacy: unit-L2
        # atoms keep the weight targets at frame scale (without this the
        # fit drifts to tiny atoms against huge weights — mean|W| ~8 with
        # spikes >1000 — which the ReLU-headed trunk, initialized near
        # zero, cannot usefully chase during the weight-L1 phase)
        norms = np.sqrt(np.sum(B * B, axis=1, keepdims=True)) + eps
        B = (B / norms).astype(np.float32)
        W = W * norms[:, 0][None, :]
        # W: semi-NMF multiplicative update (keeps W >= 0)
        XB = X @ B.T
        BB = B @ B.T
        XBp, XBm = (np.abs(XB) + XB) / 2, (np.abs(XB) - XB) / 2
        BBp, BBm = (np.abs(BB) + BB) / 2, (np.abs(BB) - BB) / 2
        W = W * np.sqrt((XBp + W @ BBm + eps) / (XBm + W @ BBp + eps))
        if it % 10 == 9 or it == iters - 1:
            err = float(np.sum((X - W @ B) ** 2))
            log(
                f"  semi-NMF iter {it + 1}/{iters}: frame SNR "
                f"{10 * np.log10(norm_x / max(err, 1e-30)):.2f} dB"
            )
    return W.astype(np.float32), B


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--audio_index", nargs="+", required=True,
                   help="index txt file(s) of preprocessed wav .npy paths "
                        "(train + valid)")
    p.add_argument("--out_dir", required=True,
                   help="basis dataset dir; writes basis_signal_weight.npy "
                        "and weight/<name>.npy")
    p.add_argument("--L", type=int, default=30, help="basis frame length")
    p.add_argument("--C", type=int, default=256, help="number of bases")
    p.add_argument("--iters", type=int, default=80)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    paths = []
    for f in args.audio_index:
        with open(f) as fh:
            paths += [ln.strip() for ln in fh if ln.strip()]
    # weight files are keyed by wav basename — dedup keeps one fit per file
    paths = sorted(set(paths))

    frames = [
        wav_to_frames(np.load(pth).astype(np.float32), args.L) for pth in paths
    ]
    offsets = np.cumsum([0] + [f.shape[0] for f in frames])
    X = np.concatenate(frames, axis=0)
    print(f"{len(paths)} utterances -> {X.shape[0]} frames of L={args.L}")

    W, B = semi_nmf(X, args.C, iters=args.iters, seed=args.seed)

    # OLA-domain check on the first utterance
    h = args.L // 2
    rec_f = W[offsets[0] : offsets[1]] @ B
    wav0 = np.load(paths[0]).astype(np.float32)
    rec = np.zeros(offsets[1] * h + h, np.float32)
    for f in range(rec_f.shape[0]):
        rec[f * h : f * h + args.L] += rec_f[f]
    rec = rec[: wav0.shape[0]]
    snr = 10 * np.log10(
        np.sum(wav0**2) / max(float(np.sum((wav0 - rec) ** 2)), 1e-30)
    )
    print(f"OLA reconstruction SNR (utt 0): {snr:.2f} dB")

    os.makedirs(os.path.join(args.out_dir, "weight"), exist_ok=True)
    np.save(
        os.path.join(args.out_dir, "basis_signal_weight.npy"),
        B.T.astype(np.float32),  # (L, C) — reference layout
    )
    for i, pth in enumerate(paths):
        w = W[offsets[i] : offsets[i + 1]]  # (Tw, C)
        np.save(
            os.path.join(args.out_dir, "weight", os.path.basename(pth)),
            w.T.astype(np.float32),  # (C, Tw) — reference layout
        )
    print(f"wrote {args.out_dir}/basis_signal_weight.npy + weight/ x{len(paths)}")


if __name__ == "__main__":
    main()
