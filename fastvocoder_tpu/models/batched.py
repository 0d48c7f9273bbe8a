"""Batched bucketed synthesis — high-throughput mel->wav serving.

The reference synthesizes strictly one utterance at a time on CPU
(reference bin/test.py:126-129).  On TPU, throughput comes from batching:
this module groups utterances into (bucketed-length, batch) groups, pads,
runs one compiled program per bucket shape, and trims each result — the
serving-style path behind the ">100x realtime batched synthesis" target.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


def bucket_length(T: int, bucket_frames: int) -> int:
    return ((T + bucket_frames - 1) // bucket_frames) * bucket_frames


class BatchedSynthesizer:
    """forward(params, mel (B, T, C)) -> wav (B, T * samples_per_frame).

    Pass a `jax.sharding.Mesh` to serve data-parallel across a TPU slice:
    parameters replicate, each bucket batch shards along dim 0 (padded to a
    multiple of the mesh size), and XLA partitions the whole synthesis
    program over ICI — the serving analog of `parallel/mesh.py`'s training
    sharding.  Same results as single-device (tests/test_batched.py proves
    it on a virtual 8-device CPU mesh)."""

    def __init__(
        self,
        forward: Callable,
        params,
        samples_per_frame: int,
        bucket_frames: int = 64,
        max_batch: int = 32,
        mesh=None,
        batch_pad: str = "exact",
    ):
        """batch_pad: "exact" compiles one program per distinct group size
        (fine for offline sweeps at a fixed batch); "pow2" pads each group
        to the next power of two (<= max_batch) by repeating its last row
        and trims the outputs — bounds the compiled-program count to
        O(buckets * log2(max_batch)) for live serving, where group sizes
        vary per request wave."""
        import jax

        self.mesh = mesh
        self.n_dev = 1
        if mesh is None:
            self.forward = jax.jit(forward)
            self.params = params
        else:
            from fastvocoder_tpu.parallel.mesh import (
                batch_sharding,
                replicated,
            )

            self.n_dev = mesh.devices.size
            self.forward = jax.jit(
                forward,
                in_shardings=(replicated(mesh), batch_sharding(mesh)),
                out_shardings=batch_sharding(mesh),
            )
            self.params = jax.device_put(params, replicated(mesh))
        self.spf = samples_per_frame
        self.bucket_frames = bucket_frames
        self.max_batch = max_batch
        if batch_pad not in ("exact", "pow2"):
            raise ValueError(f"batch_pad: want 'exact' or 'pow2', got {batch_pad!r}")
        self.batch_pad = batch_pad

    def _group_size(self, n: int) -> int:
        if self.batch_pad == "pow2":
            p = 1
            while p < n:
                p *= 2
            return min(p, self.max_batch)
        return n

    def warmup(
        self, bucket_lengths: Sequence[int], feature_dim: int = 80
    ) -> int:
        """Pre-compile every program __call__ can dispatch for utterances
        up to the given bucket lengths (first-compile on TPU is tens of
        seconds — do it before the first request, not during).  Returns
        the number of (bucket, group-size) programs warmed.  batch_pad
        "pow2" warms log2(max_batch)+1 sizes per bucket; "exact" must warm
        every group size 1..max_batch (modulo device rounding) — that cost
        is why live serving defaults to "pow2"."""
        # dedupe RAW request counts by the padded row count __call__ would
        # dispatch (group-size padding + device rounding), then warm through
        # __call__ itself so the compiled shapes match dispatch exactly
        seen, raw_counts = set(), []
        for k in range(1, self.max_batch + 1):
            rows = self._group_size(k)
            if self.n_dev > 1:
                rows += (-rows) % self.n_dev
            if rows not in seen:
                seen.add(rows)
                raw_counts.append(k)
        n = 0
        for T in bucket_lengths:
            Tb = bucket_length(T, self.bucket_frames)
            for k in raw_counts:
                self([np.zeros((Tb, feature_dim), np.float32)] * k)
                n += 1
        return n

    def __call__(self, mels: Sequence[np.ndarray]) -> List[np.ndarray]:
        """mels: list of (T_i, C) -> list of (T_i * samples_per_frame,) wavs,
        in input order."""
        order: Dict[int, List[int]] = {}
        for i, m in enumerate(mels):
            order.setdefault(bucket_length(m.shape[0], self.bucket_frames), []).append(i)

        out: List[np.ndarray] = [None] * len(mels)  # type: ignore[list-item]
        for Tb, idxs in sorted(order.items()):
            for start in range(0, len(idxs), self.max_batch):
                group = idxs[start : start + self.max_batch]
                batch = np.stack(
                    [
                        np.pad(mels[i], ((0, Tb - mels[i].shape[0]), (0, 0)))
                        for i in group
                    ]
                ).astype(np.float32)
                want_rows = self._group_size(batch.shape[0])
                if self.n_dev > 1:
                    want_rows += (-want_rows) % self.n_dev
                if want_rows > batch.shape[0]:
                    batch = np.concatenate(
                        [
                            batch,
                            np.repeat(
                                batch[-1:], want_rows - batch.shape[0], axis=0
                            ),
                        ]
                    )
                wavs = np.asarray(self.forward(self.params, batch))
                for row, i in enumerate(group):
                    out[i] = wavs[row, : mels[i].shape[0] * self.spf]
        return out
