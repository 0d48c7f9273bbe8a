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
    ):
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
                if self.n_dev > 1 and batch.shape[0] % self.n_dev:
                    pad = (-batch.shape[0]) % self.n_dev
                    batch = np.concatenate(
                        [batch, np.repeat(batch[-1:], pad, axis=0)]
                    )
                wavs = np.asarray(self.forward(self.params, batch))
                for row, i in enumerate(group):
                    out[i] = wavs[row, : mels[i].shape[0] * self.spf]
        return out
