"""Whole-corpus HBM cache with on-device crop gathering.

The reference streams every batch host->device: random crops are cut on the
CPU and `.to(device)` ships them each step (reference bin/train.py:423-429,
data/dataset.py:63-73).  That design is wrong for this environment twice
over:

  * the remote device link makes per-step H2D the bottleneck — a
    Basis-MelGAN batch carries ~70 MB of weight targets per step (batch 32
    x 2240 weight-steps x 256 ch), measured at 1.3-2.0 s/step against
    0.2-0.3 s/step of actual compute;
  * the axon client leaks ~1:1 host RAM per device_put (docs/PERF.md), so
    long runs must be cut into supervisor segments just to shed the leak.

A speech-vocoder training corpus is tiny by HBM standards (the full clean
corpus — mel + wav + basis weight targets — is ~1 GB padded), so the
TPU-native answer is to stage the entire corpus in device memory ONCE and
cut the random crops on device: per step the host sends two int32 vectors
(utterance ids + crop starts, ~256 bytes), and a jitted gather slices the
batch out of HBM at memory bandwidth.  H2D traffic per step drops ~5
orders of magnitude, and the RAM leak stops growing with step count.

Crop semantics match `data.dataset.crop_item`/`collate` exactly: start is
uniform over [0, len-fixed) (0 when the utterance is shorter), wav spans
`hop_size` samples per frame, weight spans `hop_size/(L/2)` steps per
frame, shorter utterances read zero padding (the stacked arrays are
zero-padded, which is what `_pad_to` produces).  The reference's
mega-batch sort-by-length (reference data/dataset.py:131-142) is a
variable-length padding-efficiency trick; with static `fixed_length`
crops it only permutes item order within an epoch, so the device path
uses the plain per-epoch shuffle.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from fastvocoder_tpu.hparams import HP, Hparams


def _staged_put(x: np.ndarray, sharding=None, log=print):
    """One device_put per modality.

    Round-5 postmortem: an earlier chunked-put + on-device-concatenate
    variant hung the device queue indefinitely on the 552 MB bf16 weight
    corpus (block_until_ready returned early, then every later program
    queued behind a concat that never finished).  Plain single transfers —
    including the 552 MB one — complete in seconds over the same link; the
    hangs originally blamed on transfer size were in fact a pathological
    lax.gather compile (see _make_gather).
    """
    import jax

    return jax.device_put(x, sharding) if sharding else jax.device_put(x)


class DeviceCorpus:
    """Stage a BufferDataset/WeightDataset's items in HBM; serve batches by
    on-device gathering.

    With a mesh, the corpus is replicated across the data-parallel devices
    and gathered batches come out batch-sharded — the same layout
    `runtime.prefetch_to_device(..., mesh=...)` produces for host batches.
    """

    def __init__(self, dataset, hp: Hparams = HP, L: Optional[int] = None,
                 mesh=None, log=print):
        import jax

        self.hp = hp
        self.L = L
        self.mesh = mesh

        items = [dataset[i] for i in range(len(dataset))]
        n = len(items)
        frames = np.array([it["mel"].shape[0] for it in items], np.int32)
        F = int(frames.max())
        hop = hp.hop_size

        def stack(key, length, dtype=np.float32):
            arrs = []
            for it in items:
                x = np.asarray(it[key], dtype)[:length]
                pad = [(0, length - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
                arrs.append(np.pad(x, pad))
            return np.stack(arrs)

        # FRAME-MAJOR layout: every modality is stored as (N*F, row) so a
        # crop is `fixed_length` consecutive ROWS and the whole gather is an
        # embedding-style row lookup (jnp.take along axis 0 with small
        # uniform slices).  The per-element dynamic_slice formulation (a
        # lax.gather with 33,600-element slices) sent the remote XLA
        # compiler into a >13-minute compile; row gathers compile and run
        # like any embedding table.
        mel = stack("mel", F)  # (N, F, 80)
        if "f0" in items[0]:
            # NHV conditioning: f0 as mel channel 80 (data.dataset.collate)
            f0 = stack("f0", F)
            mel = np.concatenate([mel, f0[..., None]], axis=-1)
        self.F = F
        host = {
            "mel": mel.reshape(n * F, -1),
            "wav": stack("wav", F * hop).reshape(n * F, hop),
        }
        self.wstep = None
        if "weight" in items[0]:
            import ml_dtypes

            self.wstep = hop // (L // 2)
            # bf16 target: the host path already ships weights f16 (an L1
            # target; the loss accumulates f32) — same precision class
            host["weight"] = stack(
                "weight", F * self.wstep, ml_dtypes.bfloat16
            ).reshape(n * F, self.wstep, -1)

        self.n_items = n
        self.frames = frames
        nbytes = sum(a.nbytes for a in host.values())

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
        else:
            sharding = None
            self._batch_sharding = None
        # chunked staging: one big transfer (e.g. the 56 MB wav matrix) can
        # wedge the remote axon link; <=8 MB slabs ride the same transfer
        # path the training pipeline has always used, then a compiled
        # concatenate assembles the corpus on device
        self.arrays = {
            k: _staged_put(v, sharding, log=log) for k, v in host.items()
        }
        log(
            f"device corpus: {n} utterances, {F} max frames, "
            f"{nbytes / 1e6:.0f} MB staged in HBM "
            f"({'mesh-replicated' if mesh is not None else 'single device'})"
        )
        self._gather = {}  # (with_weight,) -> compiled gather

    # ------------------------------------------------------------------
    # on-device gather
    # ------------------------------------------------------------------

    def _make_gather(self, with_weight: bool):
        import jax
        import jax.numpy as jnp

        fixed = self.hp.fixed_length
        hop = self.hp.hop_size
        wstep = self.wstep

        # the corpus arrays are EXPLICIT arguments, not closure captures —
        # jit embeds closed-over concrete arrays as compile-time constants,
        # which bakes the whole corpus into the executable (multi-minute
        # compile, cache keyed on the data itself)
        def gather(arrays, fidx):
            B = fidx.shape[0]
            mel = jnp.take(arrays["mel"], fidx, axis=0)  # (B, fixed, C)
            wav = jnp.take(arrays["wav"], fidx, axis=0).reshape(
                B, fixed * hop
            )
            out = {"mel": mel, "wav": wav}
            if with_weight:
                w = jnp.take(arrays["weight"], fidx, axis=0)
                out["weight"] = w.reshape(B, fixed * wstep, w.shape[-1])
            return out

        if self._batch_sharding is not None:
            shardings = jax.tree_util.tree_map(
                lambda _: self._batch_sharding,
                {"mel": 0, "wav": 0, **({"weight": 0} if with_weight else {})},
            )
            return jax.jit(gather, out_shardings=shardings)
        return jax.jit(gather)

    def gather(self, idx: np.ndarray, starts: np.ndarray,
               with_weight: bool = False) -> dict:
        key = bool(with_weight and self.wstep is not None)
        if key not in self._gather:
            self._gather[key] = self._make_gather(key)
        arrays = self.arrays
        if not key and "weight" in arrays:
            # keep the no-weight program's signature weight-free so the
            # phase transition does not recompile over a dead argument
            arrays = {k: v for k, v in arrays.items() if k != "weight"}
        # flat frame rows: crop = `fixed` consecutive rows of item idx
        fidx = (
            (np.asarray(idx, np.int64) * self.F + np.asarray(starts))[:, None]
            + np.arange(self.hp.fixed_length)[None, :]
        ).astype(np.int32)
        return self._gather[key](arrays, fidx)

    # ------------------------------------------------------------------
    # training stream
    # ------------------------------------------------------------------

    def sample_crops(self, rng: np.random.Generator, idx: np.ndarray):
        """crop_item's start distribution: uniform over [0, len-fixed)
        when len > fixed+1, else 0."""
        lens = self.frames[idx]
        fixed = self.hp.fixed_length
        hi = np.maximum(lens - fixed, 1)
        starts = rng.integers(0, hi)
        return np.where(lens > fixed + 1, starts, 0).astype(np.int32)

    def batches(
        self,
        seed: int = 0,
        batch_size: Optional[int] = None,
        shard_index: int = 0,
        shard_count: int = 1,
        start_step: int = 0,
        weight_until: int = 0,
    ) -> Iterator[dict]:
        """Endless per-epoch-shuffled device batch stream.

        Epoch accounting matches `data.dataset.batch_iterator`'s drop-last
        mega-batch arithmetic so `steps_per_epoch` stays consistent between
        the host and device paths.  `weight_until`: weight targets are only
        consumed by the weight-L1 phase (reference bin/train.py:87-89), so
        they stop being gathered past the discriminator boundary.
        """
        hp = self.hp
        bs = batch_size if batch_size is not None else hp.batch_size
        mega = bs * hp.batch_expand_size
        step = start_step
        for epoch in range(hp.epochs):
            rng = np.random.default_rng((seed, epoch))
            order = rng.permutation(self.n_items)
            per = len(order) // shard_count
            order = order[shard_index * per : (shard_index + 1) * per]
            order = order[: (len(order) // mega) * mega]
            for b in range(len(order) // bs):
                idx = order[b * bs : (b + 1) * bs]
                starts = self.sample_crops(rng, idx)
                step += 1
                with_weight = (
                    self.wstep is not None and step <= weight_until
                )
                yield self.gather(idx, starts, with_weight=with_weight)
