"""GAN losses over the composite discriminator's list-of-lists output.

Parity with the loss math inlined in the reference trainer
(reference bin/train.py:100-120, 157-169): LSGAN MSE-to-ones adversarial
loss on each scale's final output, L1 feature matching over intermediate
layers against stop-gradient real features, and MSE real/fake discriminator
loss.  All take the tuple-of-tuples produced by
`models.discriminator.composite.Discriminator`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

DiscOut = Sequence[Sequence[jnp.ndarray]]


def adversarial_loss(est_p: DiscOut) -> jnp.ndarray:
    """mean_i MSE(est_p[i][-1], 1) (reference bin/train.py:100-103)."""
    total = 0.0
    for feats in est_p:
        score = feats[-1].astype(jnp.float32)  # loss math always f32 (bf16-safe)
        total = total + jnp.mean(jnp.square(score - 1.0))
    return total / float(len(est_p))


def feature_map_loss(est_p: DiscOut, real_p: DiscOut) -> jnp.ndarray:
    """mean_{i, j<last} L1(est_p[i][j], stop_grad(real_p[i][j]))
    (reference bin/train.py:111-118; real features under no_grad)."""
    total = 0.0
    for est_feats, real_feats in zip(est_p, real_p):
        for e, r in zip(est_feats[:-1], real_feats[:-1]):
            e = e.astype(jnp.float32)
            r = jax.lax.stop_gradient(r).astype(jnp.float32)
            total = total + jnp.mean(jnp.abs(e - r))
    return total / (float(len(est_p)) * float(len(est_p[0]) - 1))


def discriminator_loss(
    real_p: DiscOut, fake_p: DiscOut
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(real_loss, fake_loss): mean_i MSE(real[i][-1], 1) and
    mean_i MSE(fake[i][-1], 0) (reference bin/train.py:160-168)."""
    real_loss = 0.0
    fake_loss = 0.0
    for real_feats, fake_feats in zip(real_p, fake_p):
        real = real_feats[-1].astype(jnp.float32)
        fake = fake_feats[-1].astype(jnp.float32)
        real_loss = real_loss + jnp.mean(jnp.square(real - 1.0))
        fake_loss = fake_loss + jnp.mean(jnp.square(fake))
    n = float(len(real_p))
    return real_loss / n, fake_loss / n
