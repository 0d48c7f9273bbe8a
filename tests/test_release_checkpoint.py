"""Durable release checkpoints (tools/export_release_checkpoint.py).

Only committed files survive this environment's host resets (a round-4
reboot wiped runs/), so the best clean-protocol checkpoint per family is
committed as a compressed f16 npz; the restore path must reproduce a
published {'model','pattern'} artifact whose synthesis matches the source
checkpoint to f16 precision.
"""

import os
import sys

import numpy as np

from fastvocoder_tpu.hparams import load_model_config
from fastvocoder_tpu.train.checkpoint import load_checkpoint, save_checkpoint

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

CONF = os.path.join(os.path.dirname(__file__), "..", "conf")


def test_export_restore_roundtrip(tmp_path, rng):
    import jax

    from export_release_checkpoint import main as release_main
    from fastvocoder_tpu.models.factory import build_generator

    cfg = load_model_config("hifigan", os.path.join(CONF, "hifigan/light.yaml"))
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]
    src = str(tmp_path / "ckpt.pth.tar")
    save_checkpoint(src, cfg, params, None, step=77)

    npz = str(tmp_path / "release.npz")
    release_main([
        "export", "--checkpoint", src, "--model_name", "hifigan",
        "--config", os.path.join(CONF, "hifigan/light.yaml"), "--out", npz,
    ])
    out = str(tmp_path / "restored.pth.tar")
    release_main(["restore", "--npz", npz, "--out", out])

    a = load_checkpoint(src, cfg, with_discriminator=False)["gen_params"]
    b = load_checkpoint(out, cfg, with_discriminator=False)["gen_params"]
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-4
        )  # f16 quantization bound
