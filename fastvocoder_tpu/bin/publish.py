"""Publish driver: training checkpoint -> deployable artifact
(reference bin/publish.py).

For basis-melgan, precomputes the zero-input bias waveform for a 30,000-frame
(300 s) mel and stores it as 'pattern' alongside the model weights
(reference bin/publish.py:67-75).  Unlike the reference (which silently saves
nothing for other models), non-basis models are published as {'model'} only.
"""

from __future__ import annotations

import argparse

import numpy as np

from fastvocoder_tpu.hparams import load_model_config
from fastvocoder_tpu.models.factory import build_generator
from fastvocoder_tpu.train.checkpoint import load_checkpoint, save_published

PATTERN_FRAMES = 30000  # "support up to synthesize 300s waveform" (publish.py:69)


def publish_model(
    checkpoint_path: str,
    config_path: str,
    model_name: str,
    save_path: str,
    pattern_frames: int = PATTERN_FRAMES,
):
    import jax

    cfg = load_model_config(model_name, config_path)
    ckpt = load_checkpoint(checkpoint_path, cfg, with_discriminator=False)
    gen_params = ckpt["gen_params"]

    if model_name == "basis-melgan":
        gen = build_generator(cfg)
        zero_mel = np.zeros((1, pattern_frames, cfg.arch.in_channels), np.float32)
        bias = gen.apply(
            {"params": gen_params}, zero_mel, method=gen.inference
        )
        pattern = np.asarray(jax.device_get(bias))[0]
    else:
        pattern = np.zeros((0,), np.float32)

    save_published(save_path, cfg, gen_params, pattern)
    print(f"published {model_name} -> {save_path}")


def run_publisher(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", type=str)
    parser.add_argument("--model_name", type=str,
                        help="melgan, hifigan, multiband-hifigan, basis-melgan")
    parser.add_argument("--config", type=str, help="path to model configuration file")
    parser.add_argument("--save_path", type=str, help="path to save published model")
    args = parser.parse_args(argv)
    publish_model(args.checkpoint_path, args.config, args.model_name, args.save_path)


if __name__ == "__main__":
    run_publisher()
