"""fastvocoder_tpu — a TPU-native (JAX/XLA/Pallas) neural vocoder framework.

A from-scratch rebuild of the capabilities of xcmyz/FastVocoder (reference at
/root/reference) designed TPU-first:

  * models/   — MelGAN / HiFiGAN / MultiBand-HiFiGAN / Basis-MelGAN generators
                and the MSD+MFD (and optional MPD) discriminators as flax
                modules in NTC (batch, time, channel) layout.
  * ops/      — conv primitives with exact torch-padding parity, PQMF
                filterbank, overlap-add, and Pallas fused kernels.
  * dsp/      — STFT / mel extraction / Griffin-Lim with librosa & torch.stft
                numeric parity (required for checkpoint interchange).
  * losses/   — multi-resolution STFT loss + GAN losses.
  * train/    — jitted GAN train steps, optax optimizers, reference-layout
                checkpointing and a torch<->jax converter.
  * parallel/ — jax.sharding Mesh data-parallel training over ICI.
  * data/     — dataset/index pipeline compatible with the reference artifact
                layout (*.npy wav / *.mel.npy pairs + index files).
  * bin/      — CLI drivers (train / preprocess / synthesize / test / publish)
                with the reference's shell-script surface.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/tmp/fastvocoder_jax_cache") -> None:
    """Persistent XLA compilation cache — makes repeated CLI invocations skip
    recompiles. Called automatically by the CLI drivers and bench."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # on this class of (single-core) machine even sub-second compiles are
        # worth caching; entry-size floor off so tiny programs cache too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without the knobs
        pass
