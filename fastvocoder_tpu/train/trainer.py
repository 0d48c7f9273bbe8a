"""Jitted GAN train steps (generator + discriminator, one compiled fn each).

TPU-native redesign of the reference's per-step `trainer()`
(reference bin/train.py:48-255).  The reference's data-dependent phase switch
(`if current_step > discriminator_train_start_steps`) is a *static* training
boundary, so instead of a `lax.cond` over both phases we compile two step
functions and let the host pick per step:

  * `pre_adv_step`  — generator only: MR-STFT (+ Basis-MelGAN weight L1)
    losses (reference bin/train.py:77-89; weight L1 only while
    step <= discriminator_train_start_steps, bin/train.py:87-89).
  * `gan_step`      — generator with adversarial MSE-to-ones + feature-map
    L1 against stop-gradient real features, followed by the discriminator
    update on a re-computed stop-gradient estimate ("re-compute y_ which
    leads better quality", bin/train.py:148) — all inside one jit, no host
    round-trips.

Optimizers are optax Adam(eps=1e-6) with global-norm clip 1.0 and the
optional torch-style cosine annealing schedule (reference bin/train.py:325-351).
Basis-MelGAN's basis layer is frozen by masking it out of the generator
optimizer (the reference freezes it by optimizing only `model.melgan`,
bin/train.py:329-331).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from fastvocoder_tpu.hparams import DISC, DiscriminatorConfig, HP, Hparams, ModelConfig
from fastvocoder_tpu.losses import (
    adversarial_loss,
    discriminator_loss,
    feature_map_loss,
    reconstruction_loss,
)
from fastvocoder_tpu.models.factory import build_discriminator, build_generator
from fastvocoder_tpu.ops.pqmf import PQMF


# ---------------------------------------------------------------------------
# Optimizers
# ---------------------------------------------------------------------------


def torch_cosine_annealing(
    base_lr: float, t_max: int = 2500, eta_min: Optional[float] = None
) -> optax.Schedule:
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form
    (reference bin/train.py:344-351: T_max=2500, eta_min=lr/10)."""
    if eta_min is None:
        eta_min = base_lr / 10.0

    def schedule(count):
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * count / t_max)
        )

    return schedule


def _adam(lr, grad_clip: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-6),
    )


def basis_freeze_labels(params) -> Any:
    """'freeze' for every leaf under a 'basis_signal' subtree, else 'train'."""

    def walk(node, frozen):
        if isinstance(node, (dict, FrozenDict)):
            return {
                k: walk(v, frozen or k == "basis_signal") for k, v in node.items()
            }
        return "freeze" if frozen else "train"

    return walk(params, False)


def make_generator_optimizer(
    hp: Hparams,
    model_name: str,
    use_scheduler: bool = False,
    learning_rate: Optional[float] = None,
) -> optax.GradientTransformation:
    lr = learning_rate if learning_rate is not None else hp.learning_rate
    sched = torch_cosine_annealing(lr) if use_scheduler else lr
    if model_name != "basis-melgan":
        return _adam(sched, hp.grad_clip_thresh)
    # Freeze the basis layer (reference optimizes only model.melgan,
    # bin/train.py:329-331) while keeping the reference's quirk of computing
    # the clip norm over *all* generator grads incl. the frozen basis
    # (clip_grad_norm_(model.parameters()), bin/train.py:133 — SURVEY.md §7).
    return optax.chain(
        optax.clip_by_global_norm(hp.grad_clip_thresh),
        optax.multi_transform(
            {
                "train": optax.adam(sched, b1=0.9, b2=0.999, eps=1e-6),
                "freeze": optax.set_to_zero(),
            },
            basis_freeze_labels,
        ),
    )


def make_discriminator_optimizer(
    hp: Hparams, use_scheduler: bool = False, learning_rate: Optional[float] = None
) -> optax.GradientTransformation:
    lr = (
        learning_rate
        if learning_rate is not None
        else hp.learning_rate_discriminator
    )
    sched = torch_cosine_annealing(lr) if use_scheduler else lr
    return _adam(sched, hp.grad_clip_thresh)


# ---------------------------------------------------------------------------
# Train state
# ---------------------------------------------------------------------------


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # scalar int32
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any


@dataclasses.dataclass(frozen=True)
class Trainer:
    """Bundles the modules, optimizers, and the two compiled steps.

    Construct once per run via `make_trainer`; all methods are pure wrt the
    TrainState (safe under jit / pjit / donation).
    """

    cfg: ModelConfig
    hp: Hparams
    generator: Any
    discriminator: Any
    gen_tx: optax.GradientTransformation
    disc_tx: optax.GradientTransformation
    pqmf: Optional[PQMF]
    # rematerialize the generator forward in the backward pass
    # (jax.checkpoint): the G update's peak memory no longer holds the
    # generator's activation stack alive through the discriminator
    # forward/backward — trades one extra G forward per step for memory,
    # enabling long training crops (see docs/PERF.md "Memory")
    remat: bool = False

    # ---- state init ----

    def init_state(
        self, rng: jax.Array, mel_frames: Optional[int] = None
    ) -> TrainState:
        T = mel_frames if mel_frames is not None else self.hp.fixed_length
        ch = getattr(self.cfg.arch, "in_channels", 80)
        if self.cfg.model_name == "nhv":
            ch += 1  # f0 conditioning channel (dsp/f0.py)
        mel = jnp.zeros((1, T, ch), jnp.float32)
        # discriminator inputs are always full-band waveforms
        wav = jnp.zeros((1, T * self.hp.hop_size), jnp.float32)

        # one compiled init program — eager flax init dispatches hundreds of
        # tiny ops, which is very slow over a remote-device link
        def init_fn(rng):
            g_rng, d_rng = jax.random.split(rng)
            gen_params = self.generator.init(g_rng, mel)["params"]
            disc_params = self.discriminator.init(d_rng, wav)["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                gen_params=gen_params,
                disc_params=disc_params,
                gen_opt_state=self.gen_tx.init(gen_params),
                disc_opt_state=self.disc_tx.init(disc_params),
            )

        return jax.jit(init_fn)(rng)

    # ---- forward helpers ----

    def _gen_forward(self, params, mel, step=None):
        def fwd(params, mel):
            kw = {}
            if self.cfg.model_name == "nhv" and step is not None:
                # fresh noise-source draw per train step (deterministic in step)
                kw["rngs"] = {
                    "noise": jax.random.fold_in(jax.random.PRNGKey(42), step)
                }
            out = self.generator.apply({"params": params}, mel, **kw)
            if self.cfg.model_name == "basis-melgan":
                return out  # (est_source, est_weight)
            return out, None

        if self.remat:
            fwd = jax.checkpoint(fwd)
        return fwd(params, mel)

    def _to_fullband(self, est):
        if self.pqmf is not None:
            return self.pqmf.synthesis(est)[..., 0]
        return est

    # ---- the two compiled steps ----

    def pre_adv_step(
        self, state: TrainState, mel, wav, weight=None
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Generator-only phase (step <= discriminator_train_start_steps)."""

        def loss_fn(gen_params):
            est, est_weight = self._gen_forward(gen_params, mel, step=state.step)
            stft_l, weight_l = reconstruction_loss(
                est, wav, est_weight=est_weight, weight=weight, pqmf=self.pqmf
            )
            total = self.cfg.lambda_stft * stft_l
            metrics = {"stft_loss": stft_l}
            if weight_l is not None:
                total = total + weight_l  # unscaled (reference bin/train.py:89)
                metrics["weight_loss"] = weight_l
                metrics["weight_average_value"] = jnp.mean(est_weight)
            metrics["total_loss"] = total
            return total, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.gen_params)
        updates, gen_opt_state = self.gen_tx.update(
            grads, state.gen_opt_state, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, updates)
        return (
            state.replace(
                step=state.step + 1,
                gen_params=gen_params,
                gen_opt_state=gen_opt_state,
            ),
            metrics,
        )

    def gan_step(
        self, state: TrainState, mel, wav, weight=None
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Full GAN phase (step > discriminator_train_start_steps):
        G update (stft + adv + fm), then D update on re-computed stop-grad
        estimate — one jit, two optimizer applications."""

        def gen_loss_fn(gen_params):
            est, est_weight = self._gen_forward(gen_params, mel, step=state.step)
            stft_l, _ = reconstruction_loss(
                est, wav, est_weight=est_weight, weight=weight, pqmf=self.pqmf
            )
            total = self.cfg.lambda_stft * stft_l
            metrics = {"stft_loss": stft_l}

            est_full = self._to_fullband(est)
            disc_apply = lambda p, w: self.discriminator.apply({"params": p}, w)
            if self.remat:
                # the composite discriminator's per-scale feature maps are
                # the largest activation group in the G update; recompute
                # them in the backward instead of keeping them live
                disc_apply = jax.checkpoint(disc_apply)
            est_p = disc_apply(state.disc_params, est_full)
            adv_l = adversarial_loss(est_p)
            total = total + self.hp.lambda_adv * adv_l
            metrics["adversarial_loss"] = adv_l
            if self.cfg.use_feature_map_loss:
                real_p = jax.lax.stop_gradient(
                    self.discriminator.apply({"params": state.disc_params}, wav_full)
                )
                fm_l = feature_map_loss(est_p, real_p)
                total = total + self.hp.lambda_fm * fm_l
                metrics["feature_map_loss"] = fm_l
            metrics["total_loss"] = total
            return total, metrics

        # the discriminator always sees full-band waveforms: `wav` targets are
        # full-band even for multiband models (the loss PQMF-analyzes them),
        # and the estimate is PQMF-synthesized before D
        # (reference bin/train.py:95-97, loss.py:18)
        wav_full = wav

        grads, metrics = jax.grad(gen_loss_fn, has_aux=True)(state.gen_params)
        updates, gen_opt_state = self.gen_tx.update(
            grads, state.gen_opt_state, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, updates)

        # --- discriminator phase: re-forward G with *updated* params under
        # stop_gradient (reference bin/train.py:144-155) ---
        est_for_d, _ = self._gen_forward(gen_params, mel, step=state.step)
        est_for_d = jax.lax.stop_gradient(self._to_fullband(est_for_d))

        def disc_loss_fn(disc_params):
            real_p = self.discriminator.apply({"params": disc_params}, wav_full)
            fake_p = self.discriminator.apply({"params": disc_params}, est_for_d)
            real_l, fake_l = discriminator_loss(real_p, fake_p)
            return real_l + fake_l, {"discriminator_loss": real_l + fake_l}

        d_grads, d_metrics = jax.grad(disc_loss_fn, has_aux=True)(
            state.disc_params
        )
        d_updates, disc_opt_state = self.disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        metrics.update(d_metrics)
        return (
            state.replace(
                step=state.step + 1,
                gen_params=gen_params,
                disc_params=disc_params,
                gen_opt_state=gen_opt_state,
                disc_opt_state=disc_opt_state,
            ),
            metrics,
        )

    def valid_step(self, state: TrainState, mel, wav) -> jnp.ndarray:
        """Validation MR-STFT loss on a fixed-size crop batch."""
        est, _ = self._gen_forward(state.gen_params, mel)
        stft_l, _ = reconstruction_loss(est, wav, pqmf=self.pqmf)
        return stft_l

    def valid_step_full(self, gen_params, mel, wav, valid_samples) -> jnp.ndarray:
        """Full-utterance validation loss (reference bin/train.py:451-471:
        batch-1, full-length items).  Inputs are padded to a length bucket
        for static shapes; `valid_samples` (scalar) masks the padded tail out
        of the MR-STFT loss.  Takes host params (not the mesh-replicated
        TrainState) so multi-host runs can validate on process 0's local
        devices without cross-host collectives."""
        from fastvocoder_tpu.losses import reconstruction_loss_masked

        est, _ = self._gen_forward(gen_params, mel)
        return reconstruction_loss_masked(est, wav, valid_samples, pqmf=self.pqmf)


def make_trainer(
    cfg: ModelConfig,
    hp: Hparams = HP,
    basis_signal_weight: Optional[np.ndarray] = None,
    use_scheduler: bool = False,
    learning_rate: Optional[float] = None,
    learning_rate_discriminator: Optional[float] = None,
    compute_dtype: Any = None,
    disc_cfg: DiscriminatorConfig = DISC,
    remat: bool = False,
) -> Trainer:
    """compute_dtype=jnp.bfloat16 gives mixed-precision training: bf16
    activations/kernels inside the conv stacks, f32 master params and f32
    loss math — the TPU-native replacement for the reference's apex amp O1
    (reference bin/train.py:41-45,335-342; no loss scaling needed, bf16 has
    f32's exponent range).  remat=True rematerializes the generator forward
    (jax.checkpoint) — one extra G forward per step for a lower activation
    peak; use for long `fixed_length` crops."""
    hp = hp.replace(use_feature_map_loss=cfg.use_feature_map_loss)
    generator = build_generator(
        cfg, basis_signal_weight=basis_signal_weight, compute_dtype=compute_dtype
    )
    if cfg.use_mpd and not disc_cfg.use_mpd:
        # YAML `use_mpd: True` reaches training through the model config
        # (the reference's MPD is implemented but unwired,
        # reference model/discriminator/discriminator.py:16)
        disc_cfg = dataclasses.replace(disc_cfg, use_mpd=True)
    discriminator = build_discriminator(
        disc_cfg=disc_cfg, compute_dtype=compute_dtype
    )
    return Trainer(
        cfg=cfg,
        hp=hp,
        generator=generator,
        discriminator=discriminator,
        gen_tx=make_generator_optimizer(
            hp, cfg.model_name, use_scheduler, learning_rate
        ),
        disc_tx=make_discriminator_optimizer(
            hp, use_scheduler, learning_rate_discriminator
        ),
        pqmf=PQMF() if cfg.multiband else None,
        remat=remat,
    )
