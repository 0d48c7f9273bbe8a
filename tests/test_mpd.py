"""MPD parity vs the reference's (unwired) MultiPeriodDiscriminator
(reference model/discriminator/mpd.py:288-304 — the list-of-lists variant)."""

import numpy as np
import pytest

from tests.conftest import requires_reference, reference_on_path

from fastvocoder_tpu.models.discriminator.mpd import MultiPeriodDiscriminator
from fastvocoder_tpu.train.checkpoint import MapEntry, torch_to_flax


def _mpd_key_map():
    entries = []
    for i in range(5):
        p = f"discriminators.{i}"
        f = (f"disc_{i}",)
        for c in range(5):
            entries.append(MapEntry(f"{p}.convs.{c}", f + (f"conv_{c}",), "conv2d"))
        entries.append(MapEntry(f"{p}.conv_post", f + ("conv_post",), "conv2d"))
    return entries


@requires_reference
def test_mpd_parity_and_pad_path(rng):
    """Full per-layer parity at a period-aligned length, plus the reflect-pad
    branch (T not divisible by any period) — one torch build/convert for
    both (the full-size MPD is the expensive part on a single-core host)."""
    reference_on_path()
    import torch

    from model.discriminator.mpd import MultiPeriodDiscriminator as RefMPD

    torch.manual_seed(7)
    ref = RefMPD()
    ref.eval()
    params = torch_to_flax(ref.state_dict(), _mpd_key_map())
    mpd = MultiPeriodDiscriminator()

    B, T = 2, 2310  # multiple of 2*3*5*7*11 to avoid pad-path ambiguity
    wav = (0.1 * rng.standard_normal((B, T))).astype(np.float32)
    import jax

    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(wav).unsqueeze(1))
    # jitted: eager dispatch of the 5-period conv stack is ~20s on this box
    apply = jax.jit(lambda p, w: mpd.apply({"params": p}, w))
    outs = apply(params, wav[..., None])

    assert len(outs) == len(ref_outs) == 5
    for si, (ours, theirs) in enumerate(zip(outs, ref_outs)):
        assert len(ours) == len(theirs) == 7
        for li, (o, t) in enumerate(zip(ours, theirs)):
            t = t.numpy()
            o = np.asarray(o)
            if t.ndim == 4:  # (B, C, H, W) -> (B, H, W, C)
                t = np.transpose(t, (0, 2, 3, 1))
            else:  # score (B, 1, N) -> (B, N, 1)
                t = np.transpose(t, (0, 2, 1))
            np.testing.assert_allclose(
                o, t, atol=5e-4, rtol=1e-3, err_msg=f"period {si} layer {li}"
            )

    # reflect-pad branch: T=1151 is not divisible by 2, 3, 5, 7, or 11
    wav = (0.1 * rng.standard_normal((1, 1151))).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(wav).unsqueeze(1))
    outs = jax.jit(lambda p, w: mpd.apply({"params": p}, w))(
        params, wav[..., None]
    )
    for ours, theirs in zip(outs, ref_outs):
        t = theirs[-1].numpy()
        np.testing.assert_allclose(
            np.asarray(ours[-1]), np.transpose(t, (0, 2, 1)), atol=5e-4, rtol=1e-3
        )
