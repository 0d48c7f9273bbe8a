"""Gradient parity vs the torch reference through the full training path:
generator forward -> MR-STFT loss -> backward.  Forward parity alone can
hide backward bugs (e.g. in the custom transposed-conv lowering or the
weight-norm reparameterization); identical gradients on converted weights
prove the training dynamics match."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, reference_on_path

from fastvocoder_tpu.hparams import load_model_config
from fastvocoder_tpu.losses.stft_loss import multi_resolution_stft_loss
from fastvocoder_tpu.models.factory import build_generator
from fastvocoder_tpu.train.checkpoint import generator_key_map, torch_to_flax

CONF = os.path.join(os.path.dirname(__file__), "..", "conf")


@requires_reference
def test_melgan_generator_grad_parity():
    # own rng: inputs must not depend on how many draws earlier tests took
    rng = np.random.default_rng(17)
    reference_on_path()
    import torch
    from model.loss.stft_loss import MultiResolutionSTFTLoss

    from tests.test_models import _build_reference_model

    import jax

    torch.manual_seed(11)
    cfg = load_model_config("melgan", os.path.join(CONF, "melgan/original.yaml"))
    ref = _build_reference_model("melgan", cfg.raw)
    km = generator_key_map(cfg)
    params = torch_to_flax(ref.state_dict(), km)
    gen = build_generator(cfg)

    T = 12
    mel = rng.standard_normal((1, T, 80)).astype(np.float32)
    wav = (0.2 * rng.standard_normal((1, T * 240))).astype(np.float32)

    # ---- torch backward ----
    ref_loss_mod = MultiResolutionSTFTLoss()
    mel_t = torch.from_numpy(np.transpose(mel, (0, 2, 1)))
    est_t = ref(mel_t)
    if est_t.dim() == 3:
        est_t = est_t[:, 0, :]
    sc, mag = ref_loss_mod(est_t, torch.from_numpy(wav))
    (sc + mag).backward()

    # ---- jax backward ----
    def loss_fn(p):
        est = gen.apply({"params": p}, mel)
        sc, mag = multi_resolution_stft_loss(est, wav)
        return sc + mag

    grads = jax.jit(jax.grad(loss_fn))(params)

    # torch grads live on the weight-norm (weight_v, weight_g) params; ours
    # on (kernel, g).  Compare every matching leaf through the same key map.
    ref_grads = {
        name: p.grad.detach().numpy()
        for name, p in ref.named_parameters()
        if p.grad is not None
    }
    checked = 0
    for entry in km:
        g_leaf = "gt" if entry.kind == "convT" else "g"
        for torch_suffix, flax_leaf in (
            ("weight_v", "kernel"), ("weight_g", g_leaf), ("bias", "bias"),
        ):
            tkey = f"{entry.torch_prefix}.{torch_suffix}"
            if tkey not in ref_grads:
                continue
            node = grads
            for part in entry.flax_path:
                node = node[part]
            if flax_leaf not in node:
                continue
            g_ref = ref_grads[tkey]
            g_ours = np.asarray(node[flax_leaf])
            if torch_suffix == "weight_v":
                if entry.kind == "convT":  # (Cin, Cout, K) -> (K, Cin, Cout)
                    g_ref = np.transpose(g_ref, (2, 0, 1))
                else:  # (Cout, Cin, K) -> (K, Cin, Cout)
                    g_ref = np.transpose(g_ref, (2, 1, 0))
            elif torch_suffix == "weight_g":
                g_ref = g_ref.reshape(-1)
            # float accumulation through the deep graph leaves ~1e-3-scale
            # absolute noise; scale the tolerance to the leaf's magnitude and
            # additionally require near-perfect direction agreement
            scale = max(float(np.abs(g_ref).max()), 1e-6)
            np.testing.assert_allclose(
                g_ours, g_ref, atol=2e-2 * scale, rtol=1e-2, err_msg=tkey
            )
            cos = float(
                np.dot(g_ours.ravel(), g_ref.ravel())
                / (np.linalg.norm(g_ours) * np.linalg.norm(g_ref) + 1e-12)
            )
            assert cos > 0.9999, (tkey, cos)
            checked += 1
    assert checked >= 20, f"only {checked} gradient leaves compared"
